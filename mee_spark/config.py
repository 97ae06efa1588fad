"""Job configuration and engine constants.

The reference drives everything from YAML handler configs
(`modules/handlers/handlerconfig.py:33-118`); our schema is fixed by
BASELINE.json's input_hint, so the config surface collapses to a small
dataclass of paths and tuning knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# BM25 parameters (north star: k1=1.2, b=0.75).
K1: float = 1.2
B: float = 0.75

# Postings per block-max block (per-block max-score metadata granularity).
BLOCK_SIZE: int = 128

# Tokenizer contract (FIXTURES.md §4): NFC → lowercase → split on
# non-alphanumeric → drop empties. The same regex is used by the Spark
# engine (JVM-side), the pure-Python oracle, and the DuckDB oracle SQL.
TOKEN_SPLIT_PATTERN: str = "[^0-9a-z]+"


@dataclass
class IndexConfig:
    """Tuning knobs for an index build.

    Designed for the 10^12-doc scale point:
      * ``doc_range_size`` — docIDs are dense; postings are grouped by
        ``range_id = doc_id // doc_range_size``. This is the explicit
        docID range partitioning from the north rule: every
        (term, range_id) group holds at most ``doc_range_size`` postings,
        so even a stopword-class head term ("the" in >30% of docs) never
        produces an unbounded shuffle group — skew is capped by design.
        At 10^12 docs with range 2^20 that is ~10^6 ranges; each
        (term,range) group is <= 1M postings (~a few MB compressed).
      * ``num_term_buckets`` — segment files are laid out by
        ``bucket = xxhash64(term) % num_term_buckets`` so a query touching
        q terms reads only the matching buckets (partition pruning).
      * ``head_term_df_threshold`` / ``salt_buckets`` — terms whose df
        exceeds the threshold get a salted two-stage aggregation when
        computing term statistics, so no single reducer sees a whole
        head-term posting stream.
    """

    index_dir: str = ""
    k1: float = K1
    b: float = B
    block_size: int = BLOCK_SIZE
    doc_range_size: int = 1 << 20
    num_term_buckets: int = 32
    num_doc_partitions: int = 32
    head_term_df_threshold: int = 1 << 16
    salt_buckets: int = 16
    wand_min_postings: int = 1 << 16
    lang_filter: str | None = None
    extra_spark_conf: dict = field(default_factory=dict)


# On-disk layout identity. ``doc_range_size`` defines which range a
# tombstoned docID masks; ``num_term_buckets`` defines which bucket
# directory a term's postings live in. A reader/compactor/incremental
# writer using different values than build time would silently mask the
# wrong ranges (resurrecting deleted docs) or prune the wrong buckets —
# so these are persisted in every manifest and checked on reuse.
LAYOUT_FIELDS = ("doc_range_size", "num_term_buckets")


def layout_record(cfg: IndexConfig) -> dict:
    """The layout-identity fields persisted into each gen's manifest."""
    return {f: getattr(cfg, f) for f in LAYOUT_FIELDS}


def check_layout(cfg: IndexConfig, chain: list[dict]) -> None:
    """Raise if ``cfg`` disagrees with any recorded layout in ``chain``.

    Manifests written before layout persistence carry no ``config`` key;
    those are skipped (best-effort on legacy indexes, strict otherwise).
    """
    for m in chain:
        rec = m.get("config")
        if not rec:
            continue
        bad = {f: (rec[f], getattr(cfg, f))
               for f in LAYOUT_FIELDS if f in rec and rec[f] != getattr(cfg, f)}
        if bad:
            detail = ", ".join(
                f"{f}: built with {b}, caller passed {c}" for f, (b, c) in bad.items())
            raise ValueError(
                f"IndexConfig mismatch vs gen {m['generation']} manifest — {detail}. "
                f"Layout fields are fixed at build time; pass the recorded values.")
