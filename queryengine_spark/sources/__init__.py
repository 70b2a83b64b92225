from queryengine_spark.sources.text import read_lines, read_pipe_names, read_tsv
from queryengine_spark.sources.tables import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables", "read_lines", "read_pipe_names", "read_tsv"]
