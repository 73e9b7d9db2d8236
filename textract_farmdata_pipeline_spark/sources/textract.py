"""Textract OCR source connector (reference S4-S8) — Spark-distributed.

The reference runs one Lambda per S3 object: start an async OCR job,
poll it to completion, follow NextToken pagination, then process
(/root/reference/lambda_function.py:40-79, 779-817).  The Spark
formulation turns the per-file sequential loop into the engine's axis
of parallelism: a file-listing DataFrame fans out over executors, and
each task runs the start → poll → paginate cycle for its files inside
``mapInPandas``, yielding flattened line rows (the same shape as
:mod:`.blocks`).

The AWS boundary is injected as a client factory so tests never touch
the network (SURVEY §7: "isolated behind an interface").  boto3 is
gated behind an import-try — this container has no AWS SDK and no
credentials, so the default factory raises a clear error instead.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Iterator
from typing import Any, Protocol

import pandas as pd

from pyspark.sql import DataFrame

# Terminal job states (lambda_function.py:62).
TERMINAL_STATES = ("SUCCEEDED", "FAILED", "PARTIAL_SUCCESS")

# Reference poll parameters (lambda_function.py:57).
POLL_DELAY_S = 2
MAX_WAIT_S = 900

OCR_LINES_SCHEMA = (
    "doc_id string, seq long, block_type string, text string, "
    "page long, left double, top double, width double, height double"
)


class OcrClient(Protocol):
    """The slice of the Textract API the connector consumes."""

    def start_document_text_detection(self, **kwargs: Any) -> dict: ...

    def get_document_text_detection(self, **kwargs: Any) -> dict: ...


def boto3_client_factory(bucket: str) -> OcrClient:
    """Region-pinned Textract client (reference S4/S5,
    lambda_function.py:32-42): resolve the bucket's region, build the
    client there.  Requires boto3 + credentials at runtime."""
    try:
        import boto3  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - no AWS SDK here
        raise NotImplementedError(
            "boto3 is not installed in this environment; inject a fake "
            "client_factory (see tests) or install the AWS SDK."
        ) from exc
    s3 = boto3.client("s3")
    region = (s3.get_bucket_location(Bucket=bucket) or {}).get("LocationConstraint")
    return boto3.client("textract", region_name=region or "us-east-1")


def _ocr_one(
    client: OcrClient,
    bucket: str,
    key: str,
    poll_delay: float,
    max_wait: float,
) -> Iterator[dict]:
    """start → poll → paginate for one object (S6-S8,
    lambda_function.py:47-79); yields raw Block dicts."""
    job = client.start_document_text_detection(
        DocumentLocation={"S3Object": {"Bucket": bucket, "Name": key}}
    )
    job_id = job["JobId"]
    deadline = time.monotonic() + max_wait
    while True:
        resp = client.get_document_text_detection(JobId=job_id)
        if resp["JobStatus"] in TERMINAL_STATES:
            break
        # Wall-clock deadline (not summed poll_delay): with poll_delay=0
        # a never-terminal job must still hit max_wait instead of
        # busy-spinning forever.
        if time.monotonic() >= deadline:
            raise TimeoutError(f"Textract job {job_id} timed out")
        time.sleep(poll_delay)
    # The reference raises on any non-SUCCEEDED terminal state
    # (lambda_function.py:802-803); silently yielding zero blocks for a
    # FAILED job would be indistinguishable from an empty document.
    # ocr_listing's fault-isolation path (fail_fast=False) catches this
    # per file, matching the reference's log-and-continue handler loop.
    if resp["JobStatus"] != "SUCCEEDED":
        raise RuntimeError(f"Textract job {job_id} failed: {resp['JobStatus']}")
    while True:
        yield from resp.get("Blocks", [])
        token = resp.get("NextToken")
        if not token:
            return
        resp = client.get_document_text_detection(JobId=job_id, NextToken=token)


def _flatten(doc_id: str, seq: int, block: dict) -> tuple:
    bbox = (block.get("Geometry") or {}).get("BoundingBox") or {}
    return (
        doc_id,
        seq,
        block.get("BlockType", ""),
        block.get("Text") or "",
        int(block.get("Page") or 1),
        float(bbox.get("Left", 0) or 0),
        float(bbox.get("Top", 0) or 0),
        float(bbox.get("Width", 0) or 0),
        float(bbox.get("Height", 0) or 0),
    )


def ocr_listing(
    listing: DataFrame,
    client_factory: Callable[[str], OcrClient] = boto3_client_factory,
    poll_delay: float = POLL_DELAY_S,
    max_wait: float = MAX_WAIT_S,
    fail_fast: bool = False,
) -> DataFrame:
    """OCR every (bucket, key) row of ``listing`` into line rows.

    One Spark task handles a slice of the listing — files are OCR'd in
    parallel across executors, the reference's "one Lambda per file"
    scale-out without the Lambda.  Per-file failures are recorded and
    skipped (S11 fault isolation, lambda_function.py:796-817) unless
    ``fail_fast``.

    The output schema matches :data:`blocks.LINE_COLUMNS`, so the whole
    census pipeline composes on top unchanged.
    """
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(listing.sparkSession)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for bucket, key in zip(pdf["bucket"].tolist(), pdf["key"].tolist()):
                doc_id = key.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                try:
                    client = client_factory(bucket)
                    for seq, block in enumerate(
                        _ocr_one(client, bucket, key, poll_delay, max_wait)
                    ):
                        rows.append(_flatten(doc_id, seq, block))
                except Exception:
                    if fail_fast:
                        raise
                    # S11: log-and-continue; the poisoned file must not
                    # fail the batch.
                    continue
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "seq",
                    "block_type",
                    "text",
                    "page",
                    "left",
                    "top",
                    "width",
                    "height",
                ],
            )

    return listing.select("bucket", "key").mapInPandas(run, schema=OCR_LINES_SCHEMA)
