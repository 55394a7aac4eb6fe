"""IVF-PQ residual-ADC search (`llm/quantize.py::ivfpq_adc_topk`):
full-chain numpy differential (coarse Lloyd rounds, residual PQ codes,
probe pruning, exact integer ADC sums) plus probe-pruning semantics."""

import numpy as np
import pytest


def _reference(vecs, kc=4, iters=2, n_probe=2, qib=4, topk=5, m=4, k=8):
    """Pure-numpy IVFADC mirroring every determinism rule: scaled
    integer grid, cosine coarse assignment (tie -> lower cell),
    floor-mean centroid updates, residual PQ with lowest-id seeds and
    L2 argmin (tie -> lower cell), top-n_probe cells per query, exact
    int ADC distances on the query residual."""
    n, dim = vecs.shape
    d_sub = dim // m
    sv = np.floor(vecs.astype(np.float64) * 1_000_000)

    # --- coarse Lloyd rounds (cosine, floor-mean) ---
    cents = sv[:kc].copy()  # seeds: kc lowest ids
    cells = np.zeros(n, dtype=int)
    for _ in range(iters):
        sims = np.empty((n, len(cents)))
        for c in range(len(cents)):
            sims[:, c] = (sv * cents[c]).sum(axis=1) / (
                np.sqrt((sv * sv).sum(axis=1))
                * np.sqrt((cents[c] * cents[c]).sum())
            )
        cells = sims.argmax(axis=1)  # argmax ties -> lower cell
        new = {}
        for c in range(len(cents)):
            members = sv[cells == c]
            if len(members):
                new[c] = np.floor(members.sum(axis=0) / len(members))
        cents = np.array([new[c] for c in sorted(new)])
        cellmap = sorted(new)
        cells = np.array([cellmap[i] for i in cells])

    # --- residual PQ ---
    resid = sv - cents[[cellmap.index(c) for c in cells]]
    codes = np.zeros((n, m), dtype=int)
    pq_cents = {}
    for j in range(m):
        sub = resid[:, j * d_sub : (j + 1) * d_sub]
        seeds = sub[:k]
        d2 = ((sub[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)
        for cell in range(k):
            members = sub[codes[:, j] == cell]
            if len(members):
                pq_cents[(j, cell)] = np.floor(
                    members.sum(axis=0) / len(members)
                )

    # --- probe + ADC ---
    ref_rows = []
    for q in range(qib):
        csims = [
            (
                (sv[q] * cents[ci]).sum()
                / (
                    np.sqrt((sv[q] * sv[q]).sum())
                    * np.sqrt((cents[ci] * cents[ci]).sum())
                ),
                cellmap[ci],
            )
            for ci in range(len(cents))
        ]
        probed = [
            cell
            for _, cell in sorted(csims, key=lambda t: (-t[0], t[1]))[:n_probe]
        ]
        dists = {}
        for x in range(n):
            if x == q or cells[x] not in probed:
                continue
            qr = sv[q] - cents[cellmap.index(cells[x])]
            s = 0
            for j in range(m):
                c = pq_cents[(j, codes[x, j])]
                qs = qr[j * d_sub : (j + 1) * d_sub]
                s += int(((qs - c) ** 2).sum())
            dists[x] = s
        ranked = sorted(dists.items(), key=lambda kv: (kv[1], kv[0]))[:topk]
        for rnk, (x, s) in enumerate(ranked, 1):
            ref_rows.append((q, x, s, rnk))
    return ref_rows


def test_ivfpq_matches_numpy_reference(spark):
    from spark_etl_agent_spark.llm.quantize import ivfpq_adc_topk

    rng = np.random.RandomState(11)
    n, dim, qib, topk = 40, 64, 4, 5
    vecs = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r["qid"], r["vec_id"], r["adc_dist"], r["rnk"])
        for r in ivfpq_adc_topk(
            df, query_ids_below=qib, topk=topk
        ).collect()
    ]
    ref = _reference(vecs, qib=qib, topk=topk)
    assert sorted(got) == sorted(ref)


def test_ivfpq_candidates_only_from_probed_cells(spark):
    """Probe pruning semantics: every returned neighbor must live in
    one of its query's n_probe best coarse cells — the candidate-set
    bound that makes IVFADC sub-linear per query."""
    from spark_etl_agent_spark.llm.kmeans import train_cells
    from spark_etl_agent_spark.llm.quantize import ivfpq_adc_topk

    rng = np.random.RandomState(3)
    n = 48
    vecs = rng.uniform(-1, 1, (n, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    ref = _reference(vecs, qib=4, topk=8)
    got = ivfpq_adc_topk(df, query_ids_below=4, topk=8).collect()
    cells = {
        r["vec_id"]: r["cell"]
        for r in train_cells(df, k=4, iters=2).collect()
    }
    ref_by_q = {}
    for q, x, _, _ in ref:
        ref_by_q.setdefault(q, set()).add(cells[x])
    for r in got:
        # the reference's probed-cell set is exactly the cells its
        # results came from; Spark results must stay inside it
        assert cells[r["vec_id"]] in ref_by_q[r["qid"]]
