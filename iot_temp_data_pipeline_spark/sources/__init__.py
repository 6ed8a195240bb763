from .catalog import TABLES, load_table, register_views
from .readings import raw_readings

__all__ = ["TABLES", "load_table", "register_views", "raw_readings"]
