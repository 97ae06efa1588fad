"""Pure-Python reference engine (naive inverted index + textbook BM25).

Independent code path used only by tests (SURVEY.md §5.2 item 3): dict
inverted index, exhaustive scoring, no Spark, no numpy vectorization in
the scorer. Shares ONLY the tokenizer contract and the BM25 constants
with the engine; everything else is written separately so a bug must be
made twice to go unnoticed.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from mee_spark.bm25 import idf_py, tnorm_py
from mee_spark.config import B, K1
from mee_spark.textprep import py_tokenize


class OracleIndex:
    def __init__(self) -> None:
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)  # term -> {doc: tf}
        self.doclen: dict[int, int] = {}
        self.n_docs = 0
        self.avgdl = 0.0

    @classmethod
    def build(cls, docs: list[tuple[int, str]]) -> "OracleIndex":
        """docs: [(doc_id, text)] — text is the *extracted* text."""
        idx = cls()
        for doc_id, text in docs:
            toks = py_tokenize(text)
            idx.doclen[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                idx.postings[term][doc_id] = tf
        idx.n_docs = len(idx.doclen)
        idx.avgdl = (sum(idx.doclen.values()) / idx.n_docs) if idx.n_docs else 0.0
        return idx

    def score_all(self, query_text: str, k1: float = K1, b: float = B) -> dict[int, float]:
        """Exhaustive BM25 over the union of the query terms' postings.

        Per-doc accumulation iterates query terms in sorted order so the
        float64 summation order is fixed (SURVEY.md §7.2 determinism)."""
        terms = sorted(set(py_tokenize(query_text)))
        scores: dict[int, float] = defaultdict(float)
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = idf_py(len(plist), self.n_docs)
            for doc_id, tf in plist.items():
                scores[doc_id] += idf * tnorm_py(tf, self.doclen[doc_id], self.avgdl, k1, b)
        return dict(scores)

    def topk(self, query_text: str, k: int = 10) -> list[tuple[int, float]]:
        """[(doc_id, score)] ranked (score desc, doc_id asc)."""
        scores = self.score_all(query_text)
        return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
