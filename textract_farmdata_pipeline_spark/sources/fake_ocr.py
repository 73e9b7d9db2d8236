"""Deterministic fake OCR backend for offline connector runs.

Synthesizes Textract-shaped Block pages for a listing of fake document
keys, including NextToken pagination, so the S6-S8 connector path
(:func:`.textract.ocr_listing`) can be driven end-to-end in tests and
the correctness harness with zero network (SURVEY §7 phase 4: "fixtures
stand in for Textract").  Content is a small two-column census page —
header, names with values, continuations — derived purely from the doc
index, so every run yields identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .textract import ocr_listing

_GIVEN = ("John", "A. B.", "Robt.", "Mary Ann", "Wm.", "Seymour")
_SURNAME = ("Smith", "Grady", "Stemple", "McCoy", "Vance", "Hatfield")


def _doc_blocks(doc_idx: int, n_rows: int = 24) -> list[dict]:
    """One synthetic census page: header + two columns of records."""
    blocks = [
        {
            "BlockType": "LINE",
            "Text": "Wayne County Agricultural Census 1860",
            "Page": 1,
            "Geometry": {"BoundingBox": {"Left": 0.3, "Top": 0.01, "Width": 0.4, "Height": 0.01}},
        }
    ]
    for i in range(n_rows):
        k = doc_idx * n_rows + i
        name = f"{_GIVEN[k % 6]} {_SURNAME[k % 5]}"
        if k % 4 == 0:
            text = f"{name}, {k % 90 + 1}, {k % 70 + 1}, {k * 13 % 9000}, {k % 40}, {k % 300}"
        elif k % 4 == 1:
            text = f"{name}, -, {k % 70 + 1}, -, {k % 40}, -"
        elif k % 4 == 2:
            text = name
        else:
            text = f"{k * 7 % 4000}"  # bare continuation number
        left = 0.1 if i % 2 == 0 else 0.6
        blocks.append(
            {
                "BlockType": "LINE",
                "Text": text,
                "Page": 1 + i // 12,
                "Geometry": {
                    "BoundingBox": {
                        "Left": left,
                        "Top": 0.05 + (i % 12) * 0.07,
                        "Width": 0.3,
                        "Height": 0.012,
                    }
                },
            }
        )
    return blocks


class FakeOcrClient:
    """Textract API double with two-page NextToken responses."""

    def start_document_text_detection(self, DocumentLocation):
        key = DocumentLocation["S3Object"]["Name"]
        return {"JobId": key}

    def get_document_text_detection(self, JobId, NextToken=None):
        doc_idx = int(JobId.rsplit("-", 1)[-1].split(".")[0])
        blocks = _doc_blocks(doc_idx)
        half = len(blocks) // 2
        if NextToken is None:
            return {"JobStatus": "SUCCEEDED", "Blocks": blocks[:half], "NextToken": "p2"}
        return {"JobStatus": "SUCCEEDED", "Blocks": blocks[half:]}


def fake_client_factory(bucket: str) -> FakeOcrClient:
    return FakeOcrClient()


def fake_ocr_lines(spark: SparkSession, sf_dir: str, n_docs: int = 8) -> DataFrame:
    """OCR ``n_docs`` fake documents through the real connector."""
    listing = spark.createDataFrame(
        [("fake-bucket", f"rawfarmdata/doc-{i}.pdf") for i in range(n_docs)],
        "bucket string, key string",
    )
    return ocr_listing(listing, client_factory=fake_client_factory, poll_delay=0)
