"""Registry wave 2: relational query surface (SURVEY.md section 2.5).

Filled in incrementally; see pipeline_queries.py for wave 1.
"""

from __future__ import annotations
