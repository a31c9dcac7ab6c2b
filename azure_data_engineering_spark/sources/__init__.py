from azure_data_engineering_spark.sources.csv_pipe import read_pipe_csv, write_pipe_csv
from azure_data_engineering_spark.sources.listing import list_files
from azure_data_engineering_spark.sources.excel import ingest_excel
from azure_data_engineering_spark.sources.multimodal import with_binary_payload, decode_metadata

__all__ = [
    "read_pipe_csv",
    "write_pipe_csv",
    "list_files",
    "ingest_excel",
    "with_binary_payload",
    "decode_metadata",
]
