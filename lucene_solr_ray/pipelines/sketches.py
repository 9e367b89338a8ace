"""Mergeable sketch aggregations (SURVEY.md §2.6).

- ``hll_distinct``: HyperLogLog approximate distinct (HLLAgg,
  ``solr/core/.../search/facet/HLLAgg.java:25-40``): one sketch per batch
  per group, tree-merged in a tiny second stage — the shuffle moves
  2^p-byte registers, never raw values.
- ``tdigest_percentiles``: approximate percentiles via a mergeable
  centroid digest (PercentileAgg / AVLTreeDigest,
  ``search/facet/PercentileAgg.java:25,83-109``): per-batch digests with
  bounded centroid count, merged then queried.
- ``exact_median``: the exact interpolated quantile (quantile_cont
  semantics) per group via ``map_groups`` — SQL-checkable.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .util import read

# ---------------------------------------------------------------- HLL ----

_HLL_P = 12  # 4096 registers, ~1.6% standard error


def _hll_hash(values: np.ndarray) -> np.ndarray:
    """Stable 64-bit-ish hash of int64 values (splitmix64)."""
    x = values.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_add(registers: np.ndarray, values: np.ndarray) -> None:
    h = _hll_hash(values)
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = h << np.uint64(_HLL_P)
    # rank = leading zeros of remaining bits + 1 (capped)
    lz = np.zeros(len(h), dtype=np.int64)
    probe = np.uint64(1) << np.uint64(63)
    rest_work = rest.copy()
    # vectorized leading-zero count via float log2 (exact for these ranges)
    nz = rest_work != 0
    lz[nz] = 63 - np.floor(np.log2(rest_work[nz].astype(np.float64))).astype(np.int64)
    lz[~nz] = 64 - _HLL_P
    rank = np.minimum(lz + 1, 64 - _HLL_P + 1)
    np.maximum.at(registers, idx, rank)


def hll_estimate(registers: np.ndarray) -> float:
    m = float(1 << _HLL_P)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small cardinalities
    return float(est)


def hll_distinct(sf_dir: str, table: str = "events", key: str = "event_type",
                 value: str = "user_id"):
    """Approximate distinct ``value`` per ``key`` (rows-only check; the
    error bound vs exact is asserted in pytest)."""
    ds = read(sf_dir, table, [key, value])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k, g in batch.groupby(key, sort=False):
            regs = np.zeros(1 << _HLL_P, dtype=np.uint8)
            hll_add(regs, g[value].to_numpy(np.int64))
            out.append((k, zlib.compress(regs.tobytes(), 1)))
        return pd.DataFrame(out, columns=[key, "sketch"])

    sketches = ds.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << _HLL_P, dtype=np.uint8)
        for blob in g["sketch"]:
            regs = np.maximum(regs, np.frombuffer(
                zlib.decompress(blob), dtype=np.uint8))
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "approx_distinct": [int(round(hll_estimate(regs)))]})

    return sketches.groupby(key).map_groups(merge, batch_format="pandas")


# ------------------------------------------------------------ t-digest ---

class TDigest:
    """Small mergeable centroid digest (bounded size, scale-function-free:
    repeated compress to K centroids by quantile bucketing)."""

    K = 128

    def __init__(self, means=None, weights=None):
        self.means = np.asarray(means if means is not None else [], dtype=np.float64)
        self.weights = np.asarray(weights if weights is not None else [], dtype=np.float64)

    @classmethod
    def of(cls, values: np.ndarray) -> "TDigest":
        d = cls(values.astype(np.float64), np.ones(len(values)))
        d.compress()
        return d

    def merge(self, other: "TDigest") -> "TDigest":
        d = TDigest(np.concatenate([self.means, other.means]),
                    np.concatenate([self.weights, other.weights]))
        d.compress()
        return d

    def compress(self):
        if len(self.means) <= self.K:
            order = np.argsort(self.means)
            self.means, self.weights = self.means[order], self.weights[order]
            return
        order = np.argsort(self.means)
        m, w = self.means[order], self.weights[order]
        cum = np.cumsum(w)
        total = cum[-1]
        bucket = np.minimum((cum - w / 2) / total * self.K, self.K - 1).astype(np.int64)
        nm = np.bincount(bucket, weights=m * w, minlength=self.K)
        nw = np.bincount(bucket, weights=w, minlength=self.K)
        keep = nw > 0
        self.means, self.weights = nm[keep] / nw[keep], nw[keep]

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def to_blob(self) -> bytes:
        return zlib.compress(np.concatenate([self.means, self.weights]).tobytes())

    @classmethod
    def from_blob(cls, blob: bytes) -> "TDigest":
        arr = np.frombuffer(zlib.decompress(blob), dtype=np.float64)
        half = len(arr) // 2
        return cls(arr[:half], arr[half:])


def tdigest_percentiles(sf_dir: str, percentiles=(0.5, 0.95)):
    """Approximate percentiles of events.value per event_type."""
    ds = read(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k, g in batch.groupby("event_type", sort=False):
            out.append((k, TDigest.of(g["value"].to_numpy()).to_blob()))
        return pd.DataFrame(out, columns=["event_type", "sketch"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        d = TDigest()
        for blob in g["sketch"]:
            d = d.merge(TDigest.from_blob(blob))
        row = {"event_type": g["event_type"].iloc[0]}
        for p in percentiles:
            row[f"p{int(p * 100)}"] = d.quantile(p)
        return pd.DataFrame([row])

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type").map_groups(merge, batch_format="pandas"))


# --------------------------------------------------------- exact median --

def exact_median_events(sf_dir: str):
    """Exact interpolated median (quantile_cont 0.5) per event_type."""
    ds = read(sf_dir, "events", ["event_type", "value"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(np.float64))
        n = len(v)
        pos = 0.5 * (n - 1)
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        m = v[lo] + (v[hi] - v[lo]) * (pos - lo)
        p = np.float64(10.0) ** 6
        m = np.sign(m) * np.floor(np.abs(m) * p + 0.5) / p
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "median_value": [m]})

    return ds.groupby("event_type").map_groups(med, batch_format="pandas")


# ------------------------------------------------------- date histogram --

def date_histogram_events(sf_dir: str):
    """Range facet by day (Solr date range facets, SimpleFacets ranges)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    ds = read(sf_dir, "events", ["ts"])

    def day(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.floor_temporal(t.column("ts"), unit="day")})

    def fix_unit(t: pa.Table) -> pa.Table:
        # the groupby's pandas round-trip narrows the key to timestamp[s];
        # DuckDB date_trunc returns timestamp[us] and dtype-exact
        # comparison includes the unit
        return t.set_column(t.column_names.index("day"), "day",
                            t.column("day").cast(pa.timestamp("us")))

    return (ds.map_batches(day, batch_format="pyarrow")
            .groupby("day").aggregate(Count(alias_name="cnt"))
            .map_batches(fix_unit, batch_format="pyarrow"))


# --- Misra-Gries heavy hitters (approximate top-k frequent terms) -------

def mg_reduce(counts: "pd.Series", k: int) -> "pd.Series":
    """Reduce a counter multiset to at most ``k`` entries, Misra-Gries
    style: subtract the (k+1)-th largest count from everything and drop
    the non-positive remainder (the batched equivalent of decrementing
    all counters whenever a (k+1)-th distinct item arrives). Mergeable
    summaries (Agarwal et al., PODS 2012): merge = sum counters, reduce
    again; total undercount <= n / (k+1)."""
    import pandas as pd  # noqa: F811

    if len(counts) <= k:
        return counts
    top = counts.nlargest(k + 1)
    cut = int(top.iloc[k])
    out = counts - cut
    return out[out > 0]


def heavy_hitters_terms(sf_dir: str, k: int = 256, out_top: int = 10):
    """Approximate top-``out_top`` most frequent terms over documents
    (the streaming heavy-hitters complement to ``check.luke``'s exact
    top terms): per batch ONE vectorized value_counts reduced to a
    k-counter Misra-Gries summary, summaries merged and re-reduced on
    the driver — k rows per batch move, never the vocabulary.

    Guarantee: every term with true frequency > n_tokens/(k+1) appears,
    and each estimate undercounts by at most n_tokens/(k+1). Exact
    counts for the reported terms are restored with one follow-up
    df-style pass (estimates alone are not rankable for close ties)."""
    import pandas as pd

    from .textstats import _explode_terms

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        _, terms = _explode_terms(pa.table({"text": t.column("text")}))
        mg = mg_reduce(pd.Series(terms).value_counts(), k)
        # the empty string never tokenizes, so a "" row safely carries
        # the batch's total token count for the global error bound
        return pa.table({
            "term": pa.array(list(mg.index.astype(str)) + [""]),
            "est": pa.array(list(mg.to_numpy().astype(np.int64))
                            + [np.int64(len(terms))]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n_tokens = int(parts.loc[parts["term"] == "", "est"].sum())
    real = parts[parts["term"] != ""]
    merged = mg_reduce(real.groupby("term")["est"].sum(), k)
    # sound candidate cut: est(t) >= true(t) - n/(k+1) and est <= true,
    # so any true top-out_top term has est + err >= the out_top-th
    # largest estimate; keep everything above that line (<= k terms)
    err = n_tokens / (k + 1)
    if len(merged) > out_top:
        kth = float(merged.nlargest(out_top).iloc[-1])
        cand = sorted(merged[merged + err >= kth].index)
    else:
        cand = sorted(merged.index)

    # exact recount of the surviving candidates (candidate-scale)
    def recount(t: pa.Table) -> pa.Table:
        _, terms = _explode_terms(pa.table({"text": t.column("text")}))
        s = pd.Series(terms)
        s = s[s.isin(cand)].value_counts()
        return pa.table({"term": pa.array(s.index.astype(str)),
                         "cnt": pa.array(s.to_numpy().astype(np.int64))})

    exact = (ds.map_batches(recount, batch_format="pyarrow")
             .to_pandas().groupby("term", as_index=False)["cnt"].sum()
             .sort_values(["cnt", "term"], ascending=[False, True],
                          kind="mergesort").head(out_top))
    # Soundness gate: the candidate cut above is only guaranteed to
    # contain the true top-out_top when every true top term survived the
    # Misra-Gries summary, i.e. when its frequency exceeds n/(k+1). If
    # the out_top-th RECOUNTED frequency does not strictly beat err, a
    # dropped term (true freq <= err) could still belong to the top —
    # fall back to one exact distributed pass (near-uniform corpora).
    if len(exact) < out_top or \
            (len(exact) and float(exact["cnt"].min()) <= err):
        exact = _exact_top_terms(ds, out_top)
    return pa.Table.from_pandas(exact.reset_index(drop=True),
                                preserve_index=False)


def _exact_top_terms(ds, out_top: int) -> "pd.DataFrame":
    """Exact distributed top-``out_top`` terms: per-batch value_counts
    partials, ONE hash-bucket shuffle on term, per-bucket exact sum +
    local top-out_top (each term lives wholly in one bucket, so every
    global top term is in its bucket's local top), tiny driver merge."""
    import pandas as pd

    from .textstats import _explode_terms
    from .util import bucketed_group_agg

    def vc(t: pa.Table) -> pa.Table:
        _, terms = _explode_terms(pa.table({"text": t.column("text")}))
        s = pd.Series(terms).value_counts()
        return pa.table({"term": pa.array(s.index.astype(str)),
                         "cnt": pa.array(s.to_numpy().astype(np.int64))})

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("term", as_index=False)["cnt"].sum()
        return agg.sort_values(["cnt", "term"], ascending=[False, True],
                               kind="mergesort").head(out_top)

    parts = bucketed_group_agg(
        ds.map_batches(vc, batch_format="pyarrow"),
        ["term"], bucket_top).to_pandas()
    return (parts.sort_values(["cnt", "term"], ascending=[False, True],
                              kind="mergesort").head(out_top)
            .reset_index(drop=True))
