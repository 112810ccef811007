from .files import read_csv_table, read_json_table, read_parquet_table, read_testdata  # noqa: F401
