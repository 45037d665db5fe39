from .tables import TABLES, load_table, register_temp_views  # noqa: F401
