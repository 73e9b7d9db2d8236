"""Textract as a Spark 4 Python DataSource (``spark.read.format(...)``).

The idiomatic Spark-4 packaging of the S6-S8 connector (SURVEY §4: the
one custom *component* the reference surface needs).  Each input file
becomes one read partition, so OCR fan-out parallelism is the
DataSource's partition planning — the engine schedules, retries and
load-balances files exactly like any other scan.

Registration and use::

    from textract_farmdata_pipeline_spark.sources.datasource import (
        TextractDataSource,
    )
    spark.dataSource.register(TextractDataSource)
    lines = (
        spark.read.format("textract_ocr")
        .option("bucket", "my-bucket")
        .option("keys", "rawfarmdata/a.pdf,rawfarmdata/b.pdf")
        .option("backend", "fake")        # or "boto3" with AWS creds
        .load()
    )

The ``fake`` backend is the deterministic offline double
(:mod:`.fake_ocr`); ``boto3`` wires the real client factory.  Both
yield the flattened line-row schema every downstream operator consumes.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

OCR_LINES_DDL = (
    "doc_id string, seq long, block_type string, text string, "
    "page long, left double, top double, width double, height double"
)


class _FilePartition(InputPartition):
    def __init__(self, bucket: str, key: str):
        self.bucket = bucket
        self.key = key


class TextractOcrReader(DataSourceReader):
    def __init__(self, options: dict):
        self.bucket = options.get("bucket", "")
        keys = options.get("keys", "")
        self.keys = [k for k in keys.split(",") if k]
        self.backend = options.get("backend", "fake")
        self.poll_delay = float(options.get("poll_delay", "2"))
        self.max_wait = float(options.get("max_wait", "900"))
        self.fail_fast = options.get("fail_fast", "false").lower() == "true"

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per document: the reference's per-file Lambda
        # fan-out becomes scan parallelism
        return [_FilePartition(self.bucket, k) for k in self.keys]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        from .textract import _flatten, _ocr_one, boto3_client_factory

        if self.backend == "fake":
            from .fake_ocr import fake_client_factory as factory
        else:
            factory = boto3_client_factory
        key = partition.key
        doc_id = key.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        try:
            client = factory(partition.bucket)
            for seq, block in enumerate(
                _ocr_one(client, partition.bucket, key, self.poll_delay, self.max_wait)
            ):
                yield _flatten(doc_id, seq, block)
        except Exception:
            if self.fail_fast:
                raise
            # S11 fault isolation: a poisoned document yields no rows
            return


class TextractDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "textract_ocr"

    def schema(self) -> str:
        return OCR_LINES_DDL

    def reader(self, schema: StructType) -> TextractOcrReader:
        return TextractOcrReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "TextractStreamReader":
        return TextractStreamReader(self.options)


class TextractStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the connector (``spark.readStream.format``):
    a ``SimpleDataSourceStreamReader`` that treats the comma-separated
    key list as an append-only queue and tracks progress as an offset.

    Offsets are ``{"idx": n}`` — files strictly before ``idx`` are
    committed.  Each micro-batch OCRs up to ``files_per_trigger`` new
    files; on restart the checkpointed offset resumes after the last
    committed file, giving exactly-once file-level semantics (the
    streaming twin of the reference's one-file-per-Lambda-event loop,
    with the engine owning retries and checkpointing instead of S3
    event redelivery).

    Note: ``availableNow`` snapshots a single ``read()`` advance for
    simple stream readers — use a continuous trigger (or set
    ``files_per_trigger`` to the backlog size) to drain a fixed queue.
    """

    def __init__(self, options: dict):
        self.bucket = options.get("bucket", "")
        self.keys = [k for k in options.get("keys", "").split(",") if k]
        self.backend = options.get("backend", "fake")
        # Match the batch reader's 2 s reference default for real
        # backends; the fake backend resolves jobs instantly, so polling
        # never sleeps there.  (_ocr_one's max_wait is wall-clock, so
        # even poll_delay=0 cannot busy-spin past the deadline.)
        default_delay = "0" if self.backend == "fake" else "2"
        self.poll_delay = float(options.get("poll_delay", default_delay))
        self.max_wait = float(options.get("max_wait", "900"))
        self.per_trigger = int(options.get("files_per_trigger", "1"))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict) -> tuple:
        end_idx = min(start["idx"] + self.per_trigger, len(self.keys))
        end = {"idx": end_idx}
        rows = []
        for key in self.keys[start["idx"] : end_idx]:
            rows.extend(self._ocr_file(key))
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay after failure: deterministic for the fake backend;
        # real OCR replays the job (same document, same lines).
        rows = []
        for key in self.keys[start["idx"] : end["idx"]]:
            rows.extend(self._ocr_file(key))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass

    def _ocr_file(self, key: str) -> list[tuple]:
        from .textract import _flatten, _ocr_one, boto3_client_factory

        if self.backend == "fake":
            from .fake_ocr import fake_client_factory as factory
        else:
            factory = boto3_client_factory
        doc_id = key.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        client = factory(self.bucket)
        return [
            _flatten(doc_id, seq, block)
            for seq, block in enumerate(
                _ocr_one(client, self.bucket, key, self.poll_delay, self.max_wait)
            )
        ]
