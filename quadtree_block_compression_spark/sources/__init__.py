from .tables import load_tables, TABLES  # noqa: F401
