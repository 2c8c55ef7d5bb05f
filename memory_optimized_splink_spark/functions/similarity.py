"""Vectorized string-similarity kernels (Arrow-native batched UDFs).

The reference registers Scala JAR UDFs (jaro_winkler, jaccard,
damerau_levenshtein, ...) into Spark SQL
(/root/reference/splink/internals/spark/jar_location.py:34-75). This engine
replaces the JAR with **vectorized kernels inside Arrow UDFs** (pyspark 4.1
`arrow_udf`: the worker hands the function pyarrow.Arrays — no pandas
string materialization at the boundary); inside the batch all per-character
work runs in native code (no per-row Python in the hot path, per the north
rule). The kernel functions themselves keep their pandas-Series API (the
realtime LocalScorer and the pairwise flattening call them directly); the
UDF wrappers adapt Arrow->kernel, with a zero-copy Arrow->DuckDB fast path
for the scalar string metrics.

Semantics are pinned to DuckDB's builtin functions (the reference's default
backend) so that the driver's DuckDB oracle hash-matches:
  jaro_winkler_similarity / levenshtein / damerau_levenshtein.
tests/test_similarity_vs_duckdb.py fuzzes the kernels cell-by-cell.

Two interchangeable backends per kernel:
- **DuckDB (default when importable)**: the batch is handed to an embedded
  single-threaded DuckDB connection and the metric runs as its C++ builtin
  (vendored rapidfuzz) — the very function whose semantics these kernels
  are pinned to, so equality is by construction, and ~20x faster than the
  numpy path on name/path-shaped strings (measured at bench shape). One
  connection per worker process, reused across batches/tasks.
  Levenshtein/Damerau-Levenshtein route here only for all-ASCII batches:
  DuckDB's edit distances count BYTES while these kernels are pinned to
  Spark's codepoint semantics — the two agree exactly on ASCII.
- **numpy**: the original vectorized kernels, used when duckdb is absent
  (or per-call via use_duckdb=False) and for non-ASCII edit-distance
  batches. Kept fully tested against the same DuckDB oracle.

Scale notes (numpy path): the per-batch tensors are O(batch * Lmax) for the
edit distances and O(batch * Lmax^2) bools for Jaro matching. Rows longer
than the fast-path width (_LMAX / _DL_LMAX) are NOT truncated: they are
routed into their own narrow mini-batches at natural length (sorted by
length, with an adaptive batch size that keeps the per-batch tensor
bounded), so results stay EXACT up to a hard per-kernel ceiling (_LHARD_*).
Past the ceiling the kernel raises — silently-approximate distances on
content-like columns were round-3's "What's wrong #2"; pre-truncate or
fingerprint such columns explicitly instead. The ceiling applies to BOTH
backends (identical observable behavior regardless of which is installed).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType

try:  # pragma: no cover - exercised via the backend-equality tests
    import duckdb as _duckdb
except Exception:  # pragma: no cover
    _duckdb = None

# env escape hatch (read at import in driver AND executors): force the
# numpy kernels even where duckdb is importable, e.g. for backend A/Bs
if os.environ.get("MOS_SIMILARITY_BACKEND", "").lower() == "numpy":
    _duckdb = None

_LMAX = 256
_CHUNK = 2048
# exactness ceilings for the long-row slow path (quadratic cell count for
# Jaro/Lev time, cubic-ish tensor memory for unrestricted DL)
_LHARD_JARO = 8192
_LHARD_LEV = 8192
_LHARD_DL = 2048

# one embedded DuckDB connection per worker process (guide §4.5: heavyweight
# init once, cached in a module global with a PID guard so a reused worker
# keeps it across tasks). threads=1: each Spark task already owns one core;
# a multithreaded embedded engine inside 32 concurrent workers would
# oversubscribe. Single-threaded scans of an in-memory frame are also
# order-preserving, which the elementwise contract relies on (pinned by the
# backend-equality fuzz test).
_DUCK_CON = None
_DUCK_PID = None


def _duck_con():
    global _DUCK_CON, _DUCK_PID
    pid = os.getpid()
    if _DUCK_CON is None or _DUCK_PID != pid:
        con = _duckdb.connect()
        con.execute("SET threads TO 1")
        _DUCK_CON = con
        _DUCK_PID = pid
    return _DUCK_CON


def _all_ascii(vals: np.ndarray) -> bool:
    return all(map(str.isascii, vals))


def _duck_pairs(fn: str, v1: np.ndarray, v2: np.ndarray,
                out_dtype) -> np.ndarray:
    """SELECT fn(a, b) over two aligned object arrays of non-null strings,
    elementwise (single-threaded scan => output order == input order)."""
    con = _duck_con()
    df = pd.DataFrame({"a": v1, "b": v2})
    con.register("_mos_sim_pairs", df)
    try:
        out = con.execute(
            f"SELECT {fn}(a, b) AS s FROM _mos_sim_pairs").fetchnumpy()["s"]
    finally:
        con.unregister("_mos_sim_pairs")
    return np.ascontiguousarray(out).astype(out_dtype, copy=False)


# --------------------------------------------------- Arrow-native UDF layer

try:  # pragma: no cover - pyarrow ships with pyspark's SQL extras
    import pyarrow as pa
    import pyarrow.compute as pc
except Exception:  # pragma: no cover
    pa = pc = None

# kind -> (duckdb builtin, ascii_only, exactness ceiling): mirrors the
# _run_kernel routing exactly (jaro/JW are byte-semantics = the pinned
# semantics on every input; edit distances agree with the pinned codepoint
# semantics only on ASCII)
_DUCK_ARROW_FN = {
    "jaro": ("jaro_similarity", False, _LHARD_JARO),
    "jaro_winkler": ("jaro_winkler_similarity", False, _LHARD_JARO),
    "damerau_levenshtein": ("damerau_levenshtein", True, _LHARD_DL),
    "levenshtein": ("levenshtein", True, _LHARD_LEV),
}


def _arrow_duck_or_none(kind: str, s1, s2, out_type):
    """DuckDB fast path straight from the Arrow batch: no pandas string
    materialization on input (duckdb scans the Arrow table zero-copy) and
    an Arrow column back out. Returns None whenever ANY routing or ceiling
    condition is not trivially satisfied — the caller then falls back to
    the pandas-path kernels, which re-check everything (including raising
    the exactness-ceiling error with its exact message), so observable
    behavior is identical on every input. Null handling matches the
    kernels' fillna(""): metric(NULL, x) == metric("", x). The
    single-threaded scan preserves input order (the same pinned property
    the pandas route relies on, covered by the backend-equality tests)."""
    if _duckdb is None or pa is None:
        return None
    fn, ascii_only, lhard = _DUCK_ARROW_FN[kind]
    a = pc.fill_null(s1, "")
    b = pc.fill_null(s2, "")
    if len(a) == 0:
        return pa.array([], type=out_type)
    if ascii_only:
        if not (pc.all(pc.string_is_ascii(a)).as_py()
                and pc.all(pc.string_is_ascii(b)).as_py()):
            return None
        # all-ASCII: bytes == codepoints, one length check covers both
        wmax = max(pc.max(pc.binary_length(a)).as_py() or 0,
                   pc.max(pc.binary_length(b)).as_py() or 0)
    else:
        # the ceiling raises past lhard CODEPOINTS always and (for the
        # byte-semantics kinds) past lhard BYTES too; at or under the
        # ceiling on both measures the duck route is exact
        wmax = max(pc.max(pc.utf8_length(a)).as_py() or 0,
                   pc.max(pc.utf8_length(b)).as_py() or 0,
                   pc.max(pc.binary_length(a)).as_py() or 0,
                   pc.max(pc.binary_length(b)).as_py() or 0)
    if wmax > lhard:
        return None
    con = _duck_con()
    con.register("_mos_sim_pairs_arrow", pa.table({"a": a, "b": b}))
    try:
        out = con.execute(
            f"SELECT {fn}(a, b) AS s FROM _mos_sim_pairs_arrow"
        ).fetch_arrow_table()
    finally:
        con.unregister("_mos_sim_pairs_arrow")
    col = out.column("s").combine_chunks()
    if col.type != out_type:
        col = pc.cast(col, out_type)
    return col


def _codes(s: pd.Series, lmax: int, bytes_mode: bool = False
           ) -> tuple[np.ndarray, np.ndarray]:
    """(n, lmax) int32 matrix padded with -1, plus lengths.

    bytes_mode=True unpacks UTF-8 bytes (DuckDB's Jaro/JW operate on bytes);
    bytes_mode=False unpacks codepoints (its Levenshtein counts codepoints).
    """
    return _codes_arr(s.fillna("").astype(str).to_numpy(dtype=object),
                      lmax, bytes_mode)


def _codes_arr(vals: np.ndarray, lmax: int, bytes_mode: bool = False
               ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized encode: one NumPy 'U<lmax>' conversion turns the whole
    batch into a (n, lmax) UCS-4 codepoint matrix in a single C pass — the
    per-row encode loop below it was ~2/3 of the whole Jaro-Winkler kernel
    wall at bench shape (guide §4.2: keep the per-batch work in native
    code). bytes_mode needs UTF-8 BYTES; for ASCII batches bytes ==
    codepoints, so the same matrix serves — any non-ASCII batch falls back
    to the exact per-row encoder."""
    n = len(vals)
    lmax = max(int(lmax), 1)
    try:
        cp = np.ascontiguousarray(
            np.asarray(vals, dtype=f"U{lmax}")).view(np.uint32)
    except (TypeError, ValueError, UnicodeEncodeError):
        return _codes_arr_rowwise(vals, lmax, bytes_mode)
    cp = cp.reshape(n, lmax) if n else cp.reshape(0, lmax)
    if bytes_mode and n and int(cp.max(initial=0)) >= 128:
        return _codes_arr_rowwise(vals, lmax, bytes_mode)
    lens = np.fromiter(map(len, vals), np.int64, n)
    np.minimum(lens, lmax, out=lens)
    out = cp.astype(np.int32)
    out[np.arange(lmax)[None, :] >= lens[:, None]] = -1
    return out, lens.astype(np.int32)


def _codes_arr_rowwise(vals: np.ndarray, lmax: int, bytes_mode: bool = False
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Exact per-row fallback (non-ASCII bytes_mode batches)."""
    n = len(vals)
    out = np.full((n, lmax), -1, dtype=np.int32)
    lens = np.empty(n, dtype=np.int32)
    for i, v in enumerate(vals):  # per-row only to unpack bytes; O(n) cheap
        if bytes_mode:
            cp = np.frombuffer(v.encode("utf-8"), dtype=np.uint8)[:lmax]
        else:
            cp = np.frombuffer(v.encode("utf-32-le"), dtype=np.uint32)[:lmax]
        out[i, : len(cp)] = cp
        lens[i] = len(cp)
    return out, lens


def _jaro_block(a: np.ndarray, la: np.ndarray, b: np.ndarray, lb: np.ndarray
                ) -> np.ndarray:
    """Vectorized Jaro similarity for one block of rows.

    a,b: (n, L) code matrices; la,lb: lengths. Loop is over L (string
    positions), all row-wise work is numpy.

    Fast path: identical strings (the dominant case downstream of an
    exact-key blocking rule) resolve to 1.0 without the matching loop.
    """
    identical = (la == lb) & (a == b).all(axis=1)
    if identical.any():
        out = np.empty(len(la), dtype=np.float64)
        out[identical] = np.where(la[identical] == 0, 0.0, 1.0)
        rest = ~identical
        if rest.any():
            out[rest] = _jaro_block(a[rest], la[rest], b[rest], lb[rest])
        return out
    n, L = a.shape
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)  # (n,)
    ks = np.arange(L, dtype=np.int32)
    b_valid = ks[None, :] < lb[:, None]
    b_matched = np.zeros((n, L), dtype=bool)
    a_match_k = np.full((n, L), -1, dtype=np.int32)  # for a-pos j: matched k
    for j in range(int(la.max(initial=0))):
        aj = a[:, j]  # (n,)
        active = j < la
        # candidates: same char, within window, b pos valid & unmatched
        cand = (
            (b[:, :] == aj[:, None])
            & (np.abs(ks[None, :] - j) <= window[:, None])
            & b_valid
            & ~b_matched
            & active[:, None]
        )
        has = cand.any(axis=1)
        k_first = np.where(has, cand.argmax(axis=1), -1)
        rows = np.nonzero(has)[0]
        b_matched[rows, k_first[rows]] = True
        a_match_k[:, j] = np.where(has & active, k_first, -1)
    m = (a_match_k >= 0).sum(axis=1).astype(np.float64)  # (n,)
    # transpositions: a's matched chars in j-order vs b's matched chars in
    # k-order; count mismatching positions, halve.
    mi = a_match_k >= 0  # (n, L) a-side matched mask (j order)
    order_a = np.cumsum(mi, axis=1) - 1
    order_b = np.cumsum(b_matched, axis=1) - 1
    mmax = int(m.max(initial=0))
    t = np.zeros(n, dtype=np.float64)
    if mmax > 0:
        seq_a = np.full((n, mmax), -2, dtype=np.int32)
        seq_b = np.full((n, mmax), -3, dtype=np.int32)
        ra, ca = np.nonzero(mi)
        seq_a[ra, order_a[ra, ca]] = a[ra, ca]
        rb, cb = np.nonzero(b_matched)
        seq_b[rb, order_b[rb, cb]] = b[rb, cb]
        # DuckDB (vendored rapidfuzz) floors the half-transposition count
        mism = ((seq_a != seq_b) & (seq_a != -2) & (seq_b != -3)).sum(axis=1)
        t = (mism // 2).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m / la + m / lb + (m - t) / m) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)  # incl. either/both side empty
    return jaro


def _prefix_len(a, la, b, lb, cap: int = 4) -> np.ndarray:
    L = min(cap, a.shape[1])
    eq = (a[:, :L] == b[:, :L]) & (a[:, :L] >= 0) & (b[:, :L] >= 0)
    # running AND then sum
    run = np.cumprod(eq, axis=1, dtype=bool)
    return run.sum(axis=1).astype(np.float64)


def _ceiling_error(bad: int, lhard: int) -> ValueError:
    return ValueError(
        f"similarity kernel input of length {bad} exceeds the exact-"
        f"computation ceiling ({lhard}); these kernels are for "
        "name/path-like columns — pre-truncate, fingerprint, or shingle "
        "content-like columns explicitly instead")


def _run_kernel(s1: pd.Series, s2: pd.Series, block, *, bytes_mode: bool,
                lmax: int, chunk: int, lhard: int, cell_budget: int,
                out_dtype, duck_fn: str | None = None,
                duck_ascii_only: bool = False,
                use_duckdb: bool | None = None) -> np.ndarray:
    """Chunked kernel driver with an EXACT long-string slow path.

    Backend dispatch: when duckdb is importable (and `use_duckdb` is not
    False) the whole batch is computed by DuckDB's builtin `duck_fn` — the
    function these kernels are pinned to, elementwise over the batch (see
    _duck_pairs). `duck_ascii_only` gates that route on an all-ASCII batch
    (DuckDB edit distances count bytes; these kernels count codepoints —
    equal only on ASCII). The exactness ceiling below applies to both
    backends identically.

    numpy path: rows where both sides fit `lmax` run in `chunk`-sized
    batches at width `lmax` (the hot path — identical to the pre-round-4
    behavior). Longer rows are sorted by length and run in narrow
    mini-batches at their natural width, sized so each batch stays under
    `cell_budget` matrix cells — no truncation, so values match the oracle
    at any length up to `lhard`, past which we raise instead of silently
    approximating."""
    v1 = s1.fillna("").astype(str).to_numpy(dtype=object)
    v2 = s2.fillna("").astype(str).to_numpy(dtype=object)
    n = len(v1)
    enc = (lambda x: len(x.encode("utf-8"))) if bytes_mode else len
    # exactness ceiling, checked from O(1) CHAR lengths first so the duckdb
    # route skips the full UTF-8 encode pass: bytes >= chars always, and
    # bytes <= 4*chars, so only rows in the ambiguous band need encoding
    c1 = np.fromiter(map(len, v1), np.int64, n)
    c2 = np.fromiter(map(len, v2), np.int64, n)
    cw = np.maximum(c1, c2)
    cmax = int(cw.max(initial=0))
    if cmax > lhard:
        raise _ceiling_error(cmax, lhard)
    if bytes_mode and 4 * cmax > lhard:
        for i in np.nonzero(4 * cw > lhard)[0]:
            bad = max(enc(v1[i]), enc(v2[i]))
            if bad > lhard:
                raise _ceiling_error(bad, lhard)
    use = (_duckdb is not None) if use_duckdb is None \
        else (use_duckdb and _duckdb is not None)
    if use and duck_fn and n and \
            (not duck_ascii_only or (_all_ascii(v1) and _all_ascii(v2))):
        return _duck_pairs(duck_fn, v1, v2, out_dtype)
    if bytes_mode:
        l1 = np.fromiter(map(enc, v1), np.int64, n)
        l2 = np.fromiter(map(enc, v2), np.int64, n)
        width = np.maximum(l1, l2)
    else:
        l1, l2, width = c1, c2, cw
    out = np.empty(n, dtype=out_dtype)

    def run(idx: np.ndarray, step: int) -> None:
        for lo in range(0, len(idx), step):
            sel = idx[lo:lo + step]
            cap = int(width[sel].max(initial=1)) or 1
            a, la = _codes_arr(v1[sel], cap, bytes_mode)
            b, lb = _codes_arr(v2[sel], cap, bytes_mode)
            out[sel] = block(a, la, b, lb)

    fast = width <= lmax
    run(np.nonzero(fast)[0], chunk)
    idx_long = np.nonzero(~fast)[0]
    if len(idx_long):
        idx_long = idx_long[np.argsort(width[idx_long], kind="stable")]
        cap = int(width[idx_long].max())
        run(idx_long, max(1, cell_budget // (cap * cap)))
    return out


def jaro_np(s1: pd.Series, s2: pd.Series,
            use_duckdb: bool | None = None) -> np.ndarray:
    return _run_kernel(
        s1, s2, _jaro_block, bytes_mode=True, lmax=_LMAX, chunk=_CHUNK,
        lhard=_LHARD_JARO, cell_budget=1 << 28, out_dtype=np.float64,
        duck_fn="jaro_similarity", use_duckdb=use_duckdb)


def jaro_winkler_np(s1: pd.Series, s2: pd.Series,
                    prefix_weight: float = 0.1,
                    boost_threshold: float = 0.7,
                    use_duckdb: bool | None = None) -> np.ndarray:
    """Jaro-Winkler matching DuckDB's jaro_winkler_similarity (prefix<=4,
    scaling 0.1, boost only when jaro > 0.7). Non-default prefix/boost
    parameters have no DuckDB builtin — they always run the numpy path."""

    def block(a, la, b, lb):
        jaro = _jaro_block(a, la, b, lb)
        pl = _prefix_len(a, la, b, lb)
        return np.where(
            jaro > boost_threshold,
            jaro + prefix_weight * pl * (1.0 - jaro), jaro)

    duck_fn = ("jaro_winkler_similarity"
               if (prefix_weight, boost_threshold) == (0.1, 0.7) else None)
    return _run_kernel(
        s1, s2, block, bytes_mode=True, lmax=_LMAX, chunk=_CHUNK,
        lhard=_LHARD_JARO, cell_budget=1 << 28, out_dtype=np.float64,
        duck_fn=duck_fn, use_duckdb=use_duckdb)


def _levenshtein_block(a, la, b, lb) -> np.ndarray:
    """Levenshtein, vectorized over rows; loops over i (chars of a)
    with the prefix-min trick resolving the in-row left dependency:
      D[i,j] = min(cand[j], min_{k<j}(cand[k] + (j-k)))
             = min.accumulate(cand - j)[j] + j   where cand folds the
      delete/substitute candidates.
    """
    n, L = a.shape
    Lb = b.shape[1]
    js = np.arange(Lb + 1, dtype=np.float64)
    prev = np.tile(js, (n, 1))  # D[0, :] = j
    imax = int(la.max(initial=0))
    for i in range(1, imax + 1):
        ai = a[:, i - 1]  # (n,)
        active = (i <= la)
        sub_cost = (b != ai[:, None]).astype(np.float64)  # (n, Lb)
        cand = np.empty((n, Lb + 1), dtype=np.float64)
        cand[:, 0] = i  # first column: i deletions
        # delete (from above) vs substitute (diag)
        cand[:, 1:] = np.minimum(prev[:, 1:] + 1.0, prev[:, :-1] + sub_cost)
        # resolve left-neighbor (insert) dependency via prefix-min
        shifted = cand - js[None, :]
        run = np.minimum.accumulate(shifted, axis=1)
        cur = np.minimum(cand, run + js[None, :])
        # mask invalid b positions beyond lb: distance only read at j=lb
        prev = np.where(active[:, None], cur, prev)
    return prev[np.arange(n), lb].astype(np.int64)


def _dl_unrestricted_block(a, la, b, lb) -> np.ndarray:
    """UNRESTRICTED Damerau-Levenshtein (DuckDB's damerau_levenshtein and
    the reference's Scala UDF semantics — transposed characters may take
    part in further edits, unlike OSA: dl("ca","abc")=2, osa=3).

    Classic last-occurrence formulation (Lowrance-Wagner), row-vectorized:
    the full (n, La+2, Lb+2) D tensor is kept because the transposition
    candidate D[k,l] reaches back to arbitrary earlier rows. `da` (last row
    where each alphabet symbol occurred in a) is a per-row table over the
    batch's compacted alphabet; `db` (last column matching a[i] within the
    current row) vectorizes as a running maximum over match positions. The
    insert-chain dependency resolves with the same prefix-min trick as
    Levenshtein.
    """
    n, La = a.shape
    Lb = b.shape[1]
    rows = np.arange(n)
    # compact alphabet; index 0 reserved for padding
    alphabet = np.unique(np.concatenate([a.ravel(), b.ravel()]))
    alphabet = alphabet[alphabet >= 0]
    a_idx = np.where(a >= 0, np.searchsorted(alphabet, np.clip(a, 0, None)) + 1, 0)
    b_idx = np.where(b >= 0, np.searchsorted(alphabet, np.clip(b, 0, None)) + 1, 0)
    maxdist = (la + lb).astype(np.float64)

    d = np.zeros((n, La + 2, Lb + 2), dtype=np.float64)
    d[:, 0, :] = maxdist[:, None]
    d[:, :, 0] = maxdist[:, None]
    d[:, 1, 1:] = np.arange(Lb + 1, dtype=np.float64)[None, :]   # d[1][j+1]=j
    d[:, 1:, 1] = np.arange(La + 1, dtype=np.float64)[None, :]   # d[i+1][1]=i

    da = np.zeros((n, len(alphabet) + 1), dtype=np.int64)
    js = np.arange(1, Lb + 1, dtype=np.float64)   # j = 1..Lb
    Jfull = np.arange(Lb + 2, dtype=np.float64)   # column index J = j+1
    imax = int(la.max(initial=0))
    for i in range(1, imax + 1):
        active = i <= la
        ai = a_idx[:, i - 1]  # (n,) 0 for padding (inactive rows)
        cost = (b_idx != ai[:, None]).astype(np.float64)  # (n, Lb)
        # l = db just before j: last j' < j with b[j'] == a[i]
        match_pos = np.where(b_idx == ai[:, None], np.arange(1, Lb + 1), 0)
        incl = np.maximum.accumulate(match_pos, axis=1)
        l = np.concatenate([np.zeros((n, 1), dtype=np.int64), incl[:, :-1]],
                           axis=1)  # (n, Lb)
        k = da[rows[:, None], b_idx]  # (n, Lb) last row where b[j] seen in a
        trans = (d[rows[:, None], k, l]
                 + (i - k - 1) + 1.0 + (js[None, :] - l - 1))
        diag = d[:, i, 1:Lb + 1] + cost    # d[i-1][j-1] -> mine[i][j] + cost
        up = d[:, i, 2:Lb + 2] + 1.0       # d[i][j+1] + 1
        cand = np.empty((n, Lb + 2), dtype=np.float64)
        cand[:, 0] = maxdist
        cand[:, 1] = i                     # d[i+1][1] = i
        cand[:, 2:] = np.minimum(np.minimum(diag, up), trans)
        # left/insert chain: cur[J] = min(cand[J], min_{J'<J} cur[J'] + J-J')
        shifted = cand - Jfull[None, :]
        run = np.minimum.accumulate(shifted, axis=1)
        cur = np.minimum(cand, run + Jfull[None, :])
        d[:, i + 1, :] = np.where(active[:, None], cur, d[:, i + 1, :])
        da[rows[active], ai[active]] = i
    return d[rows, la + 1, lb + 1].astype(np.int64)


# the full-D-tensor DL kernel is O(chunk * L^2) memory: bound both
_DL_LMAX = 128
_DL_CHUNK = 512


def _rect_block(block):
    """Adapt a kernel that accepts different a/b widths so the shared square
    (n, cap) driver layout trims each side to its own max length."""

    def run(a, la, b, lb):
        wa = max(int(la.max(initial=0)), 1)
        wb = max(int(lb.max(initial=0)), 1)
        return block(a[:, :wa], la, b[:, :wb], lb)

    return run


def edit_distance_np(s1: pd.Series, s2: pd.Series, damerau: bool,
                     use_duckdb: bool | None = None) -> np.ndarray:
    # edit distances are pinned to CODEPOINT counting (Spark's builtin /
    # the reference Scala UDF); DuckDB's count bytes, so the duckdb route
    # is gated on an all-ASCII batch (duck_ascii_only), where they agree
    if damerau:
        # DL memory is the binder: the (n, La+2, Lb+2) float64 tensor
        return _run_kernel(
            s1, s2, _rect_block(_dl_unrestricted_block), bytes_mode=False,
            lmax=_DL_LMAX, chunk=_DL_CHUNK, lhard=_LHARD_DL,
            cell_budget=1 << 23, out_dtype=np.int64,
            duck_fn="damerau_levenshtein", duck_ascii_only=True,
            use_duckdb=use_duckdb)
    return _run_kernel(
        s1, s2, _rect_block(_levenshtein_block), bytes_mode=False,
        lmax=_LMAX, chunk=_CHUNK, lhard=_LHARD_LEV,
        cell_budget=1 << 28, out_dtype=np.int64,
        duck_fn="levenshtein", duck_ascii_only=True, use_duckdb=use_duckdb)


def cosine_np(v1: pd.Series, v2: pd.Series) -> np.ndarray:
    """Cosine similarity over array<float> columns (ragged -> stacked)."""
    a = np.stack(v1.apply(lambda x: np.asarray(x, dtype=np.float64)).to_numpy())
    b = np.stack(v2.apply(lambda x: np.asarray(x, dtype=np.float64)).to_numpy())
    num = (a * b).sum(axis=1)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = num / den
    return np.where(den == 0, 0.0, out)


# --------------------------------------------------- pairwise (array) best

_PAIRWISE_KERNELS = {
    "jaro": (jaro_np, np.maximum),
    "jaro_winkler": (jaro_winkler_np, np.maximum),
    "levenshtein": (lambda a, b: edit_distance_np(a, b, damerau=False),
                    np.minimum),
    "damerau_levenshtein": (lambda a, b: edit_distance_np(a, b, damerau=True),
                            np.minimum),
}


# flattened cross-product rows buffered per kernel call: bounds peak memory
# when array columns are wide (a 300x300-alias row alone is 90k pairs) while
# keeping the kernel batches large enough to amortize the numpy setup
_PAIRWISE_FLAT_BUDGET = 1 << 21


def pairwise_best_np(a1: pd.Series, a2: pd.Series, metric: str) -> np.ndarray:
    """Best pairwise string metric between two array<string> columns
    (reference PairwiseStringDistanceFunctionLevel,
    comparison_level_library.py:598-692): max for similarity metrics,
    min for edit distances. The cross-products are flattened in slices of
    at most _PAIRWISE_FLAT_BUDGET rows, each slice ONE vectorized kernel
    call followed by a segmented reduce — no per-row Python kernel
    invocations, bounded peak memory regardless of array widths. Rows with
    a null/empty side or no valid (non-null) element pair yield NaN
    (condition false downstream, matching the SQL array_min-over-NULL
    behavior)."""
    kernel, reducer = _PAIRWISE_KERNELS[metric]
    n = len(a1)
    out = np.full(n, np.nan)
    v1 = a1.to_numpy(dtype=object)
    v2 = a2.to_numpy(dtype=object)

    flat_l: list[str] = []
    flat_r: list[str] = []
    counts: list[int] = []
    rows: list[int] = []

    def flush() -> None:
        if not flat_l:
            return
        scores = kernel(pd.Series(flat_l),
                        pd.Series(flat_r)).astype(np.float64)
        cnt = np.asarray(counts, dtype=np.int64)
        starts = np.cumsum(cnt) - cnt
        # segments are contiguous in append order: each row's slice runs
        # from its start to the next row's start (or the end)
        best = reducer.reduceat(scores, starts)
        idx = np.asarray(rows, dtype=np.int64)
        # a single row's product can span flushes: combine with any prior
        prior = out[idx]
        merged = np.where(np.isnan(prior), best, reducer(prior, best))
        out[idx] = merged
        flat_l.clear(), flat_r.clear(), counts.clear(), rows.clear()

    for i in range(n):
        l, r = v1[i], v2[i]
        if l is None or r is None:
            continue
        lv = [x for x in l if x is not None]
        rv = [y for y in r if y is not None]
        if not lv or not rv:
            continue
        # slice this row's cross product into budget-sized pieces (the
        # budget is soft: one left element's row of pairs is never split)
        for x in lv:
            if flat_l and len(flat_l) + len(rv) > _PAIRWISE_FLAT_BUDGET:
                flush()
            if not rows or rows[-1] != i:
                rows.append(i)
                counts.append(0)
            flat_l.extend([x] * len(rv))
            flat_r.extend(rv)
            counts[-1] += len(rv)
    flush()
    return out


def _f64_out(vals: np.ndarray):
    """float64 numpy -> Arrow with NaN mapped to NULL — the exact semantics
    of the old pandas-UDF boundary (pandas->Arrow treats NaN as null).
    Critical for the pairwise kinds, whose no-valid-pair rows are NaN: a
    raw NaN VALUE would satisfy `metric >= threshold` in Spark (NaN sorts
    above everything), silently flipping gammas; as NULL the comparison is
    false, as before."""
    vals = np.asarray(vals, dtype=np.float64)
    return pa.array(vals, type=pa.float64(), mask=np.isnan(vals))


# ------------------------------------------------------------- Arrow UDFs
#
# All pair-table metric UDFs share ONE eval type (SQL_ARROW_BATCHED: the
# worker hands the function pyarrow.Arrays), so any combination of them in
# a projection still plans a single ArrowEvalPython stage. The string
# scalar kinds take the _arrow_duck_or_none fast path — Arrow batch
# straight into the embedded DuckDB builtin with no pandas string
# materialization (measured ~25% off the bench JW stage vs the pandas-UDF
# boundary) — and fall back to the fully-tested pandas-path kernels for
# every non-trivial batch (non-ASCII edit distances, ceiling overflows,
# numpy backend forced). The array/vector kinds convert to pandas up
# front (the same conversion the pandas-UDF boundary performed) and call
# the unchanged kernels.

@F.arrow_udf(DoubleType())
def pairwise_jaro_udf(a1: pa.Array, a2: pa.Array) -> pa.Array:
    return _f64_out(pairwise_best_np(a1.to_pandas(), a2.to_pandas(),
                                     "jaro"))


@F.arrow_udf(DoubleType())
def pairwise_jaro_winkler_udf(a1: pa.Array, a2: pa.Array) -> pa.Array:
    return _f64_out(pairwise_best_np(a1.to_pandas(), a2.to_pandas(),
                                     "jaro_winkler"))


@F.arrow_udf(DoubleType())
def pairwise_damerau_levenshtein_udf(a1: pa.Array, a2: pa.Array
                                     ) -> pa.Array:
    return _f64_out(pairwise_best_np(a1.to_pandas(), a2.to_pandas(),
                                     "damerau_levenshtein"))


@F.arrow_udf(DoubleType())
def jaro_winkler_udf(s1: pa.Array, s2: pa.Array) -> pa.Array:
    out = _arrow_duck_or_none("jaro_winkler", s1, s2, pa.float64())
    if out is not None:
        return out
    return _f64_out(jaro_winkler_np(s1.to_pandas(), s2.to_pandas()))


@F.arrow_udf(DoubleType())
def jaro_udf(s1: pa.Array, s2: pa.Array) -> pa.Array:
    out = _arrow_duck_or_none("jaro", s1, s2, pa.float64())
    if out is not None:
        return out
    return _f64_out(jaro_np(s1.to_pandas(), s2.to_pandas()))


@F.arrow_udf(IntegerType())
def damerau_levenshtein_udf(s1: pa.Array, s2: pa.Array) -> pa.Array:
    out = _arrow_duck_or_none("damerau_levenshtein", s1, s2, pa.int32())
    if out is not None:
        return out
    return pa.array(
        edit_distance_np(s1.to_pandas(), s2.to_pandas(),
                         damerau=True).astype("int32"), type=pa.int32())


@F.arrow_udf(IntegerType())
def levenshtein_udf(s1: pa.Array, s2: pa.Array) -> pa.Array:
    """Levenshtein pinned to Spark's `levenshtein` builtin: codepoint
    counting AND NULL -> NULL (unlike the other metric UDFs' fillna('')
    convention — this UDF exists as a drop-in for the JVM expression
    inside an existing Arrow metric stage, where the DuckDB builtin
    measured ~25-30% off the whole scoring projection vs the JVM
    expression; equality with the builtin is fuzz-pinned incl. non-ASCII
    and nulls). ASCII batches run DuckDB's levenshtein (bytes == code-
    points there); otherwise the codepoint numpy kernel."""
    out = _arrow_duck_or_none("levenshtein", s1, s2, pa.int32())
    if out is None:
        out = pa.array(
            edit_distance_np(s1.to_pandas(), s2.to_pandas(),
                             damerau=False).astype("int32"),
            type=pa.int32())
    nulls = pc.or_(pc.is_null(s1), pc.is_null(s2))
    if pc.any(nulls).as_py():
        out = pc.if_else(nulls, pa.scalar(None, pa.int32()), out)
    return out


@F.arrow_udf(DoubleType())
def cosine_similarity_udf(v1: pa.Array, v2: pa.Array) -> pa.Array:
    return _f64_out(cosine_np(v1.to_pandas(), v2.to_pandas()))


def register_udfs(spark) -> None:
    """Register SQL-callable names mirroring the reference's JAR UDF surface
    (/root/reference/splink/internals/spark/database_api.py:166-190)."""
    spark.udf.register("jaro_winkler", jaro_winkler_udf)
    spark.udf.register("jaro_sim", jaro_udf)
    spark.udf.register("damerau_levenshtein", damerau_levenshtein_udf)
    spark.udf.register("cosine_similarity", cosine_similarity_udf)
