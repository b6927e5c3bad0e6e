"""Registry wave 3: event-time windows (SURVEY.md section 2.6)."""

from __future__ import annotations
