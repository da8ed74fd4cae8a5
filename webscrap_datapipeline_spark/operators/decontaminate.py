"""Multi-probe decontamination — the scale path for benchmark-leak
screening (plans/text_queries.contamination_screen is the per-row
``contains`` baseline).

A per-row ``contains`` scan is O(|probes| × corpus bytes): fine for a
handful of probes, hopeless for a real decontamination run where the
probe set is every eval-set sentence (10⁴–10⁶ strings). Aho-Corasick
matches ALL probes in one pass over each document — O(corpus bytes +
hits) — which is how production decontamination sweeps 100 TB.

Spark shape: the automaton ships to executors inside the mapInPandas
closure (probe sets are driver-sized by definition — short strings,
≤ a few hundred MB serialized; at larger scale you'd broadcast). The
corpus streams through Arrow batches; nothing about the corpus is ever
collected or shuffled — the only shuffle is whatever aggregation the
caller runs on the (doc_id, probe_id) hit pairs.

Pure stdlib implementation (no pyahocorasick in this environment);
correctness is pinned in pytest against the brute-force ``contains``
formulation, and the registered query shares contamination_screen's
exact SQL oracle.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

HITS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("probe_id", T.LongType()),
    ]
)


class AhoCorasick:
    """Classic Aho-Corasick automaton over unicode code points.

    States are dict-based (sparse — probe alphabets are tiny relative to
    unicode). ``outputs[s]`` holds the probe ids whose pattern ends at
    state s, INCLUDING patterns reachable via suffix links, so overlapping
    and nested probes ("abc" inside "xabcy", probe "b" inside probe
    "abc") are all reported.
    """

    def __init__(self, patterns: list[tuple[int, str]]):
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.outputs: list[set[int]] = [set()]
        for pid, pat in patterns:
            if not pat:
                continue  # empty probe matches everything; reject upstream
            s = 0
            for ch in pat:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.fail.append(0)
                    self.outputs.append(set())
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.outputs[s].add(pid)
        # BFS failure links; merge outputs along them so one state visit
        # reports every pattern ending here
        q: deque[int] = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, nxt in self.goto[s].items():
                q.append(nxt)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != nxt else 0
                self.outputs[nxt] |= self.outputs[self.fail[nxt]]

    def search(self, text: str) -> set[int]:
        """Distinct probe ids occurring anywhere in ``text``."""
        found: set[int] = set()
        s = 0
        for ch in text:
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            if self.outputs[s]:
                found |= self.outputs[s]
        return found


def contamination_hits(
    docs: DataFrame,
    probes: list[tuple[int, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, probe_id) for every document containing a probe string —
    one automaton pass per document, all probes simultaneously.
    Duplicate occurrences inside one doc collapse (containment is a
    per-doc boolean, matching the ``contains``-join semantics)."""
    for pid, pat in probes:
        if not pat:
            raise ValueError(f"empty probe (id={pid}) would match every document")
    ac = AhoCorasick(probes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc: list[int] = []
            out_probe: list[int] = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for pid in ac.search(text):
                    out_doc.append(did)
                    out_probe.append(pid)
            yield pd.DataFrame({"doc_id": out_doc, "probe_id": out_probe})

    return docs.select(id_col, text_col).mapInPandas(run, HITS_SCHEMA)
