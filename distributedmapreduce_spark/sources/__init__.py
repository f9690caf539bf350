from .testdata import TABLES, load_table, load_tables, register_views
from .text import read_text_lines

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "read_text_lines"]
