"""Streaming sketch maintenance: mergeable summaries over micro-batches.

A count-min sketch is the canonical stream summary: each micro-batch
sketches ONLY its own rows (a bounded ``depth × width`` partial — the
heavy shingle explode and aggregation stay distributed), and the
partials merge by cellwise addition.  The running state is therefore
≤ ``depth·width`` integers no matter how much data has streamed — the
property that makes "how often has this phrase occurred, ever" answerable
without reprocessing history.

The merge happens driver-side in ``foreachBatch`` because the merged
object IS driver-small by construction (4×1024 longs here) — the same
bounded-state argument as k-means centroids.  For restart safety in
production, persist the merged cells to a checkpointed table inside the
same ``foreachBatch`` (micro-batch boundaries make the write exactly-
once per batch id); the in-memory dict form below keeps tests and local
use dependency-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _check_additive_bootstrap(bootstrap, bootstrap_batch_ids) -> None:
    """Additive merges are only restart-safe when the persisted cells
    AND the batch ids they cover are reloaded together: cells without
    the id set double-merge a checkpoint-replayed batch on top of its
    own counts, and an id set without the cells silently drops every
    previously merged count.  Both halves come from the same ``sink``
    call, so receiving exactly one is always a caller bug — fail loud
    rather than corrupt the state quietly."""
    if (bootstrap is None) != (bootstrap_batch_ids is None):
        raise ValueError(
            "bootstrap and bootstrap_batch_ids must be passed together: "
            "an additive-merge restart needs the persisted cells AND the "
            "batch ids they already cover (both come from the same sink "
            "call); passing only one silently violates the restart "
            "contract (dropped counts or double-merged replays)"
        )


def cms_stream(
    docs: DataFrame,
    n: int = 2,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
    sink=None,
    bootstrap: dict[tuple[int, int], int] | None = None,
    bootstrap_batch_ids: set[int] | None = None,
):
    """Maintain a running n-gram count-min sketch over a document stream.

    Returns ``(writer, state)``: start the ``DataStreamWriter`` (tests
    use ``trigger(availableNow=True)``); ``state`` is the live merged
    sketch — a dict ``(row, bucket) -> count`` with ≤ ``depth·width``
    entries that equals the batch :func:`..operators.text_analysis.
    cms_sketch` of everything streamed so far (pinned by the
    stream-equals-batch test).  ``sink(state, batch_id)`` is called
    after each batch's merge for downstream persistence.

    RESTART CONTRACT: ``state`` and the replay guard live in this
    process only.  After a driver restart against an existing stream
    checkpoint, already-committed batches are NOT replayed, so a fresh
    empty ``state`` no longer equals the full-history batch sketch —
    the equality above holds only for a single uninterrupted run (or
    an ``availableNow`` test run).  To survive restarts, persist the
    cells from ``sink`` and reload them via ``bootstrap`` below.
    """
    from ..operators.text_analysis import cms_sketch

    _check_additive_bootstrap(bootstrap, bootstrap_batch_ids)
    # bootstrap = cells persisted by a previous run's ``sink`` (plus the
    # batch ids they already cover, so a checkpoint-replayed batch isn't
    # double-merged on top of them).
    state: dict[tuple[int, int], int] = dict(bootstrap) if bootstrap else {}
    merged_ids: set[int] = set(bootstrap_batch_ids) if bootstrap_batch_ids else set()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a retried/restart-replayed
        # micro-batch arrives with the SAME batch_id, and an additive
        # merge applied twice would permanently inflate the cells — so
        # merges are keyed by batch_id and replays are no-ops.
        if batch_id not in merged_ids:
            part = cms_sketch(
                batch_df, n=n, depth=depth, width=width, text_col=text_col
            ).collect()
            for r in part:
                key = (r["row"], r["bucket"])
                state[key] = state.get(key, 0) + r["cnt"]
            merged_ids.add(batch_id)
        if sink is not None:
            sink(state, batch_id)

    return docs.writeStream.foreachBatch(process), state


def ivf_ingest_stream(
    df: DataFrame,
    mins,
    maxs,
    anchors,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sink=None,
    bootstrap: dict[int, int] | None = None,
    bootstrap_batch_ids: set[int] | None = None,
):
    """Streaming IVF index maintenance: running per-cell admission
    counts for an embedding ingest stream against a FROZEN quantizer
    (SQ8 bounds + anchor cells trained on the pre-existing corpus —
    the stream must not re-train the index it is filling).

    Each micro-batch assigns its own rows with
    :func:`..operators.similarity.sq_assign_cells` (distributed; the
    collect is the ≤ k_coarse-row per-cell count) and merges
    additively into ``state`` (``cell -> n_added``).  Additive merges
    inherit the CMS restart contract, not the HLL one: replayed batch
    ids are no-ops via the ``merged_ids`` guard, and a driver restart
    needs ``bootstrap`` (+ covered batch ids) persisted from ``sink``.
    Compose the final state with the before-counts through
    :func:`..operators.similarity.ivf_growth_report` — the streamed
    report then hash-equals the batch :func:`..operators.similarity.
    ivf_ingest_delta` of the same split (pinned by the driver oracle
    of ``embedding_ivf_stream_replay``).
    """
    from ..operators.similarity import sq_assign_cells

    _check_additive_bootstrap(bootstrap, bootstrap_batch_ids)
    state: dict[int, int] = dict(bootstrap) if bootstrap else {}
    merged_ids: set[int] = set(bootstrap_batch_ids) if bootstrap_batch_ids else set()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id not in merged_ids:
            part = (
                sq_assign_cells(batch_df, mins, maxs, anchors, vec_col, id_col)
                .groupBy("cell")
                .count()
                .collect()
            )
            for r in part:
                state[r["cell"]] = state.get(r["cell"], 0) + r["count"]
            merged_ids.add(batch_id)
        if sink is not None:
            sink(state, batch_id)

    return df.writeStream.foreachBatch(process), state


def hll_stream(
    df: DataFrame,
    key_col: str,
    m: int = 64,
    sink=None,
    bootstrap: dict[int, int] | None = None,
):
    """Maintain a running HyperLogLog register table over a stream —
    "how many distinct keys, ever" in ``m`` integers of state.

    Each micro-batch computes its own register partials with
    :func:`..operators.approx.hll_registers` (distributed, bounded at
    ``m`` rows) and folds them into ``state`` (``register ->
    max_rho``) by cellwise MAX.  Unlike the CMS's additive merge,
    max-merge is idempotent, so a checkpoint-replayed micro-batch
    cannot corrupt the state even without a batch-id guard — HLL is
    the sketch that gets exactly-once semantics for free from
    at-least-once delivery.  The same property makes ``bootstrap``
    (cells persisted by a previous run's ``sink``) sufficient for
    restart: no covered-batch-id set is needed.

    Estimate the running cardinality at any point with
    :func:`..operators.approx.hll_estimate` over
    ``spark.createDataFrame(state.items(), "register: long, max_rho:
    long")``, or the pure-python fold the tests use.  Equality with
    the batch sketch of everything streamed is pinned by the
    stream-equals-batch test.
    """
    from ..operators.approx import hll_registers

    state: dict[int, int] = dict(bootstrap) if bootstrap else {}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = hll_registers(batch_df, key_col, m=m).collect()
        for r in part:
            reg = r["register"]
            state[reg] = max(state.get(reg, 0), r["max_rho"])
        if sink is not None:
            sink(state, batch_id)

    return df.writeStream.foreachBatch(process), state
