from .tables import TABLES, load_table, load_all
from .changelog import users_changelog, reference_scenario_changelog
from .catalog import catalog_tables_df, catalog_columns_df

__all__ = [
    "TABLES",
    "load_table",
    "load_all",
    "users_changelog",
    "reference_scenario_changelog",
    "catalog_tables_df",
    "catalog_columns_df",
]
