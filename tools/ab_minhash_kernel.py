"""Interleaved same-session A/B for the MinHash signature stage: JVM
higher-order-function expressions (token char-fold poly hash → shingle
combine → 12 affine min-hashes, all interpreted per element) vs a single
vectorized mapInArrow kernel computing the whole signature pipeline in
numpy (guide §4.2).

Verdict history:
- r12: an Arrow kernel for the token-hash step ONLY was rejected (JVM
  fold 0.21 s vs kernel 0.44 s at sf0.1/local[32]).
- r13: this tool's whole-pipeline kernel amortizes the boundary over the
  entire signature computation and is equality-gated row-identical —
  and STILL loses in this sandbox: medians 1.486 s (kernel) vs 1.256 s
  (JVM) at local[32], 1.170 vs 1.158 at local[8], and 11.2 s vs 2.6 s on
  a 32×-inflated corpus. Root cause isolated with a trivial mapInArrow
  passthrough: ~1.7 s over the bare scan for a 32-task stage — the
  JVM↔Python Arrow crossing costs ~50 ms/task here (socket syscalls +
  fresh-page faults under the VM's lazily-faulted snapshot memory), so
  the boundary, not the kernel, is the wall. Re-run this tool on real
  hardware / larger per-task payloads before re-adjudicating.

Arms:
  A = kernel (mapInArrow whole-signature, defined below)
  B = JVM HOF chain (production: lq._minhash_signatures_jvm)

Protocol: one session; equality gate first (exact row sets at the sig
level); then interleaved noop-sink-timed runs of the full
dedup_minhash_lsh query with the sig stage swapped (guide §1.4).

Usage: python tools/ab_minhash_kernel.py [sf_dir] [pairs] [cpus]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

_POW31 = None  # numpy 31^k mod P table, grown on demand


def _pow31_table(n: int):
    global _POW31
    import numpy as np

    from proteofav_spark.operators.llm_queries import P_MOD

    if _POW31 is None or _POW31.size < n:
        size = max(n, 256)
        tbl = np.empty(size, dtype=np.int64)
        tbl[0] = 1
        for i in range(1, size):
            tbl[i] = (tbl[i - 1] * 31) % P_MOD
        _POW31 = tbl
    return _POW31


def _mh_sig_kernel(batches):
    """mapInArrow kernel: the WHOLE MinHash signature pipeline, vectorized
    in numpy over each Arrow batch.

    Exact-equivalence contract with the JVM expressions (verified by this
    tool's equality gate, including \\xa0 / non-BMP / null / empty edge
    rows):
    - tokens: maximal runs of non-[Java \\s] codepoints — the separator
      class is ASCII ``[ \\t\\n\\x0B\\f\\r]`` exactly (NOT Python/unicode
      \\s: \\xa0 is a letter here, verified against the JVM path);
    - token hash: fold (h·31 + codepoint) mod P ≡ Σ cp_i·31^(L−1−i) mod P,
      vectorized as a table-lookup product + segmented sum (add.reduceat);
    - shingle hash: ((th_i·B + th_{i+1}) mod P · B + th_{i+2}) mod P over
      token triples that stay within one document;
    - signature: mh_j = min over shingles of (a_j·h + b_j) mod P, with
      empty/null texts (and < 3 tokens) → P for every j. The JVM path's
      ``array_distinct`` before the min is dropped: min over a multiset
      equals min over its set, so signatures are identical.
    All intermediates fit int64: cp ≤ 0x10FFFF, pow31 < P ≈ 1e6, so the
    per-char product < 2^51 and segment sums < #chars·P ≪ 2^63."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from proteofav_spark.operators.llm_queries import HASH_AB, P_MOD, SHINGLE_B

    P = P_MOD
    n_h = len(HASH_AB)
    A = np.array([a for a, _ in HASH_AB], dtype=np.int64).reshape(-1, 1)
    Bv = np.array([b for _, b in HASH_AB], dtype=np.int64).reshape(-1, 1)
    names = ["doc_id"] + [f"mh{j}" for j in range(n_h)]

    for batch in batches:
        n = batch.num_rows
        doc = batch.column(0)
        if n == 0:
            empty = pa.array(np.empty(0, np.int64))
            yield pa.RecordBatch.from_arrays([doc] + [empty] * n_h, names=names)
            continue
        txt = pc.fill_null(batch.column(1), "")
        if pa.types.is_large_string(txt.type):
            txt = pc.cast(txt, pa.string())
        off = np.frombuffer(txt.buffers()[1], np.int32)[
            txt.offset : txt.offset + n + 1
        ].astype(np.int64)
        db = txt.buffers()[2]
        data = (
            np.frombuffer(db, np.uint8)[off[0] : off[-1]]
            if db is not None
            else np.empty(0, np.uint8)
        )
        off = off - off[0]
        if data.size == 0 or int(data.max()) < 128:
            # ASCII fast path: UTF-8 bytes ARE the codepoints, zero-copy
            cp = data.astype(np.int64)
            coff = off
        else:
            s = data.tobytes().decode("utf-8")
            cp = np.frombuffer(s.encode("utf-32-le"), "<u4").astype(np.int64)
            clen = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            coff = np.zeros(n + 1, np.int64)
            np.cumsum(clen, out=coff[1:])
        mh = np.full((n_h, n), P, dtype=np.int64)
        if cp.size:
            sep = (cp == 32) | ((cp >= 9) & (cp <= 13))
            nonsep = ~sep
            starts = nonsep.copy()
            starts[1:] &= sep[:-1]
            bpos = coff[:-1]
            bpos = bpos[bpos < cp.size]
            starts[bpos] = nonsep[bpos]  # doc boundary restarts a token
            ends = nonsep.copy()
            ends[:-1] &= sep[1:]
            epos = coff[1:] - 1
            epos = epos[epos >= 0]
            ends[epos] = nonsep[epos]  # doc boundary ends a token
            ts = np.flatnonzero(starts)
            if ts.size:
                te = np.flatnonzero(ends)
                nz = np.flatnonzero(nonsep)
                tid = np.searchsorted(ts, nz, side="right") - 1
                k = te[tid] - nz  # char's exponent within its token
                pow31 = _pow31_table(int(k.max()) + 1)
                contrib = (cp[nz] % P) * pow31[k] % P
                th = np.add.reduceat(contrib, np.searchsorted(nz, ts)) % P
                tx = np.searchsorted(coff, ts, side="right") - 1  # doc of token
                if th.size >= 3:
                    sh = (
                        (th[:-2] * SHINGLE_B + th[1:-1]) % P * SHINGLE_B + th[2:]
                    ) % P
                    valid = tx[:-2] == tx[2:]  # triple within one doc
                    sh = sh[valid]
                    shx = tx[:-2][valid]
                    if sh.size:
                        segs = np.flatnonzero(np.r_[True, shx[1:] != shx[:-1]])
                        vals = (A * sh + Bv) % P
                        mins = np.minimum.reduceat(vals, segs, axis=1)
                        mh[:, shx[segs]] = mins
        yield pa.RecordBatch.from_arrays(
            [doc] + [pa.array(mh[j]) for j in range(n_h)], names=names
        )


def _minhash_signatures_kernel(d):
    """(doc_id, mh0..mh11) via the vectorized Arrow kernel. Only the two
    columns the kernel needs cross the Python boundary (guide §4.1), and
    the output schema follows the caller's doc_id type."""
    from proteofav_spark.operators.llm_queries import HASH_AB

    id_type = d.schema["doc_id"].dataType.simpleString()
    schema = ", ".join(
        [f"doc_id {id_type}"] + [f"mh{j} bigint" for j in range(len(HASH_AB))]
    )
    return d.select("doc_id", "text").mapInArrow(_mh_sig_kernel, schema)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = sys.argv[3] if len(sys.argv) > 3 else "32"

    from proteofav_spark.session import get_spark, warm_python_workers
    from proteofav_spark.queries import all_queries, load
    import proteofav_spark.operators.llm_queries as lq

    spark = get_spark("ab_minhash_kernel", cpus=cpus)
    warm_python_workers(spark)

    d = load(spark, sf_dir, "documents")

    # --- equality gate: kernel sig == JVM sig, exactly -------------------
    jvm = lq._minhash_signatures_jvm(d)
    ker = _minhash_signatures_kernel(d)
    cols = ["doc_id"] + [f"mh{j}" for j in range(len(lq.HASH_AB))]
    a = sorted(tuple(r[c] for c in cols) for r in jvm.select(cols).collect())
    b = sorted(tuple(r[c] for c in cols) for r in ker.select(cols).collect())
    assert a == b, f"sig mismatch: {len(a)} vs {len(b)} rows, first diff " + str(
        next((x, y) for x, y in zip(a, b) if x != y)
    )

    def run(fn) -> float:
        orig = lq._minhash_signatures
        lq._minhash_signatures = fn
        try:
            q = all_queries()["dedup_minhash_lsh"]
            t0 = time.monotonic()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0
        finally:
            lq._minhash_signatures = orig

    # warm both arms once (untimed)
    run(_minhash_signatures_kernel)
    run(lq._minhash_signatures_jvm)

    ka, jb = [], []
    for _ in range(pairs):
        ka.append(run(_minhash_signatures_kernel))
        jb.append(run(lq._minhash_signatures_jvm))

    out = {
        "query": "dedup_minhash_lsh(noop)",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "kernel_sec": [round(x, 3) for x in ka],
        "jvm_sec": [round(x, 3) for x in jb],
        "kernel_median": round(statistics.median(ka), 3),
        "jvm_median": round(statistics.median(jb), 3),
        "kernel_gain_ms": round(
            (statistics.median(jb) - statistics.median(ka)) * 1000
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
