from .blocks import (  # noqa: F401
    BLOCK_SCHEMA,
    LINE_COLUMNS,
    flatten_blocks,
    read_blocks_json,
    read_blocks_parquet,
)
from .csv_sink import write_census_csv  # noqa: F401
from .s3_events import S3_EVENT_SCHEMA, s3_events_source  # noqa: F401
from .textract import boto3_client_factory, ocr_listing  # noqa: F401
