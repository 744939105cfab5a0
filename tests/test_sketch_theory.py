"""Theory-vs-measurement pins for the sketch families (VERDICT r11 #4).

The r11 MinHash find proved oracle equality CANNOT see a biased hash
family — the oracle replays the same family, so a degenerate family
hash-matches itself perfectly.  Only a prediction pin (measured behavior
vs the closed-form law the engine's planners assume) catches that class.
This module pins the remaining families:

- SRP hyperplanes: per-plane sign-collision probability 1 − θ/π, and the
  per-table ALL-planes-agree rate (1 − θ/π)^planes — the independence
  the bucket-collision law p_agree^planes (and every recall planner on
  top of it) assumes;
- md5-60 / SimHash: bit uniformity and pairwise Hamming ~ Binomial(60,
  ½) on UNRELATED inputs — the independence the 4×15 banded join's
  chunk-collision math assumes (measured on synthetic random-vocab docs:
  the fixture corpus shares vocabulary, so ITS bits are legitimately
  corpus-correlated — the family, not the data, is under test);
- IVF coarse assignment balance — the ~n/k occupancy the cell planners
  (CELL_OCCUPANCY sizing, probe-cost estimates) assume.

Every pin is regression-tested: a deliberately degenerate family
(duplicate planes per table / bit-0-broadcast hashes / collapsed
centroids) must FAIL the same measurement the real family passes.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.operators.dedup import _md5_60
from priority_data_pipeline_postgres_db_spark.operators.similarity import (
    N_TABLES,
    _hyperplane_matrix,
    fit_ivf_centroids,
    load,
)


# -- shared measurement helpers (the degenerate runs reuse them) ----------


def _controlled_pairs(X: np.ndarray, theta: float, n_pairs: int):
    """(a, b) unit-vector pairs at EXACTLY the requested angle, built
    from fixture directions (b = cos θ·a + sin θ·u with u ⊥ a)."""
    out = []
    for i in range(n_pairs):
        a = X[i]
        c = X[i + n_pairs]
        u = c - (c @ a) * a
        u /= np.linalg.norm(u)
        out.append((a, np.cos(theta) * a + np.sin(theta) * u))
    return out


def _srp_agreement(planes: np.ndarray, pairs, n_planes: int):
    """(mean per-plane agreement, mean per-table all-agree rate)."""
    plane_agr, table_agr = [], []
    for a, b in pairs:
        eq = ((planes @ a) > 0) == ((planes @ b) > 0)
        plane_agr.append(eq.mean())
        table_agr.append(eq.reshape(-1, n_planes).all(axis=1).mean())
    return float(np.mean(plane_agr)), float(np.mean(table_agr))


def _hamming_stats(hashes: np.ndarray, n_anchor: int = 300):
    """Mean/std of pairwise Hamming distance over anchor×rest pairs."""
    ham = []
    for i in range(min(n_anchor, len(hashes) - 1)):
        x = np.bitwise_xor(hashes[i], hashes[i + 1 :])
        ham.append(
            np.array([bin(int(v) & ((1 << 64) - 1)).count("1") for v in x])
        )
    ham = np.concatenate(ham)
    return float(ham.mean()), float(ham.std())


def _fixture_unit_vectors(spark, sf_dir, n: int) -> np.ndarray:
    emb = load(spark, sf_dir, "embeddings")
    emb = emb.drop("label") if "label" in emb.columns else emb
    pdf = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(n).toPandas()
    )
    X = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
    return X / np.linalg.norm(X, axis=1, keepdims=True)


# -- SRP: 1 − θ/π per plane; (1 − θ/π)^planes per table -------------------

SRP_PLANES = 9  # the envelope boundary — hardest case for independence


def test_srp_plane_collision_matches_theory(spark, sf_dir):
    """Measured per-plane sign agreement vs 1 − θ/π across the angle
    range (measured gaps ≤ 0.003 at 216 planes × 150 pairs; tolerance
    0.02 absorbs the cube-uniform-vs-spherical plane bias and sampling
    noise), and per-table all-agree rate vs p^planes — the independence
    claim.  The relative table tolerance widens where p^9 is tiny."""
    X = _fixture_unit_vectors(spark, sf_dir, 300)
    planes = _hyperplane_matrix(X.shape[1], SRP_PLANES)
    assert planes.shape == (N_TABLES * SRP_PLANES, X.shape[1])
    for t_deg in (15, 30, 45, 60, 75, 90):
        theta = np.radians(t_deg)
        pairs = _controlled_pairs(X, theta, 150)
        p_meas, tbl_meas = _srp_agreement(planes, pairs, SRP_PLANES)
        p_pred = 1 - theta / np.pi
        assert abs(p_meas - p_pred) < 0.02, (t_deg, p_meas, p_pred)
        tbl_pred = p_pred ** SRP_PLANES
        # absolute floor covers the tiny-probability tail (θ ≥ 75°)
        assert abs(tbl_meas - tbl_pred) < max(0.35 * tbl_pred, 0.01), (
            t_deg,
            tbl_meas,
            tbl_pred,
        )


def test_srp_pin_fails_on_degenerate_planes(spark, sf_dir):
    """Regression-test the test: a family whose 9 planes per table are
    IDENTICAL (19 effective hashes instead of 216 — the exact shape of
    the r11 MinHash defect) passes per-plane agreement but violates the
    per-table independence law by an order of magnitude."""
    X = _fixture_unit_vectors(spark, sf_dir, 300)
    dim = X.shape[1]
    planes = _hyperplane_matrix(dim, SRP_PLANES).reshape(
        N_TABLES, SRP_PLANES, dim
    )
    degenerate = np.broadcast_to(
        planes[:, :1, :], planes.shape
    ).reshape(N_TABLES * SRP_PLANES, dim)
    theta = np.radians(45)
    pairs = _controlled_pairs(X, theta, 150)
    p_meas, tbl_meas = _srp_agreement(degenerate, pairs, SRP_PLANES)
    p_pred = 1 - theta / np.pi
    assert abs(p_meas - p_pred) < 0.05  # marginals still look fine...
    tbl_pred = p_pred ** SRP_PLANES
    # ...but the independence pin catches it at ~10× the predicted rate
    assert tbl_meas > 5 * tbl_pred, (tbl_meas, tbl_pred)


# -- md5-60 / SimHash: Hamming ~ Binomial(60, ½) on unrelated inputs ------


def test_md5_60_bits_binomial():
    """The token-hash primitive every text sketch shares: bit marginals
    ≈ ½ and pairwise Hamming mean/std at the Binomial(60, ½) values
    (30, √15 ≈ 3.873) — measured 30.00/3.874 on 4k tokens."""
    h = np.fromiter((_md5_60(f"tok{i}") for i in range(4000)), dtype=np.int64)
    bits = (h[:, None] >> np.arange(60)[None, :]) & 1
    marg = bits.mean(axis=0)
    assert marg.min() > 0.45 and marg.max() < 0.55, (marg.min(), marg.max())
    mean, std = _hamming_stats(h)
    assert abs(mean - 30.0) < 0.5, mean
    assert abs(std - np.sqrt(15.0)) < 0.4, std


def _simhash_family(doc_token_lists) -> np.ndarray:
    """Driver-side replica of simhash_udf's kernel (same _md5_60, same
    majority rule) — keeps the family measurable without a Spark job."""
    out = []
    bit_idx = np.arange(60, dtype=np.int64)
    for toks in doc_token_lists:
        hh = np.fromiter((_md5_60(t) for t in toks), dtype=np.int64, count=len(toks))
        b = ((hh[:, None] >> bit_idx[None, :]) & 1).astype(np.int64)
        counts = (b * 2 - 1).sum(axis=0)
        packed = 0
        for x in np.nonzero(counts > 0)[0]:
            packed |= 1 << int(x)
        out.append(packed)
    return np.array(out, dtype=np.int64)


def _random_vocab_docs(n_docs: int, seed: int = 3):
    """Unrelated documents: disjoint-in-expectation random vocabularies
    — the regime where SimHash theory predicts iid Bernoulli(½) bits.
    (The FIXTURE corpus shares vocabulary by construction, so its bit
    marginals legitimately run 0.0-1.0 — that is signal, not family
    bias; the family is what's under test here.)"""
    rng = np.random.default_rng(seed)
    return [
        [f"w{rng.integers(0, 10_000_000)}" for _ in range(int(rng.integers(20, 60)))]
        for _ in range(n_docs)
    ]


def test_simhash_hamming_binomial_on_unrelated_docs():
    sh = _simhash_family(_random_vocab_docs(400))
    mean, std = _hamming_stats(sh)
    assert abs(mean - 30.0) < 1.0, mean  # measured 29.86
    assert abs(std - np.sqrt(15.0)) < 0.6, std  # measured 3.89
    marg = ((sh[:, None] >> np.arange(60)[None, :]) & 1).mean(axis=0)
    # even-token-count docs break count ties toward 0 — a small
    # structural low bias, inside this band
    assert marg.min() > 0.35 and marg.max() < 0.65, (marg.min(), marg.max())


def test_simhash_pin_fails_on_degenerate_family():
    """Regression-test the test: a family whose 60 bits all broadcast
    bit 0 keeps mean Hamming at 30 (marginals alone can't see it) but
    its std explodes to ~30 — the binomial-std pin is the detector."""
    sh = _simhash_family(_random_vocab_docs(400))
    degenerate = np.where((sh & 1) == 1, np.int64((1 << 60) - 1), np.int64(0))
    mean, std = _hamming_stats(degenerate, n_anchor=200)
    assert abs(mean - 30.0) < 3.0  # the mean pin alone would PASS...
    assert abs(std - np.sqrt(15.0)) > 10.0, std  # ...the std pin fires


# -- IVF: the ~n/k assignment balance the cell planners assume ------------


def _ivf_balance(X: np.ndarray, cents: np.ndarray):
    counts = np.bincount((X @ cents.T).argmax(axis=1), minlength=len(cents))
    return counts.max() / counts.mean(), int((counts == 0).sum())


@pytest.mark.parametrize("k", [8, 16])
def test_ivf_assignment_balance(spark, gate_dir, k):
    """The spherical k-means coarse quantizer spreads the corpus near
    the uniform n/k the occupancy planners assume: measured max/mean
    1.18 (k=8) / 1.31 (k=16) on the gate fixture, zero empty cells.
    Bound 2.0 = the point where probe-cost estimates (nprobe/k of the
    corpus per query) start understating the hot list by 2×."""
    emb = load(spark, gate_dir, "embeddings")
    emb = emb.drop("label") if "label" in emb.columns else emb
    pdf = emb.select("embedding").toPandas()
    X = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cents = fit_ivf_centroids(emb, k)
    ratio, empty = _ivf_balance(X, cents)
    assert ratio <= 2.0, ratio
    assert empty == 0


def test_ivf_balance_pin_fails_on_collapsed_centroids(spark, gate_dir):
    """Regression-test the test: centroids collapsed to one point send
    every vector to the first cell (argmax first-tie) — max/mean = k,
    every other cell empty; the balance pin fires."""
    emb = load(spark, gate_dir, "embeddings")
    emb = emb.drop("label") if "label" in emb.columns else emb
    pdf = emb.select("embedding").limit(500).toPandas()
    X = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    k = 8
    collapsed = np.tile(X[0], (k, 1))
    ratio, empty = _ivf_balance(X, collapsed)
    assert ratio == pytest.approx(float(k)) and empty == k - 1


# ---------------------------------------------------------------------------
# dHash (image perceptual hash) — the banded-Hamming join's candidate-rate
# math (VERDICT r12 #5)
# ---------------------------------------------------------------------------
# banded_hamming_pairs bounds its work by Σ(band bucket)² over 16-bit band
# keys, which assumes dHash bits over NON-duplicate images are near-uniform
# and only weakly dependent.  For iid-noise images the family has an EXACT
# theory: each gradient bit (block[j+1] > block[j]) is Bernoulli(½) by
# symmetry; adjacent bits in one row share a block, and for iid continuous
# block means P(A>B ∧ B>C) = 1/6, so their correlation is
# (1/6 − 1/4)/(1/4) = −1/3; block rows are disjoint pixel ranges, so bits
# in different rows are independent.  Along one 8-bit row the bits form a
# Markov chain with P(next=1 | cur=1) = 1/3 and P(next=1 | cur=0) = 2/3 —
# two INDEPENDENT images agree on a whole row with probability
# ½ · (5/9)^7 (agreement is itself Markov: given agreement at bit j,
# P(agree at j+1) = (1/3)² + (2/3)² = 5/9), and a 16-bit band is two
# independent rows, so the per-band key-collision rate between unrelated
# images is (½ · (5/9)^7)² ≈ 6.7e-5 — ~4.4× a uniform 2^-16, still
# bucket-bounded.  That number IS the candidate-rate the join's Σ(bucket)²
# cost model relies on; the pins below measure it, and the degenerate
# family (monotone-gradient images: every comparison points one way)
# demonstrates the failure mode the pin exists to catch — all keys
# collapse into one bucket and the join goes quadratic.


def _dhash_family(images) -> np.ndarray:
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        dhash64,
        encode_png,
    )

    return np.array(
        [dhash64(encode_png(arr)) for arr in images], dtype=np.int64
    )


def _dhash_band_stats(hashes: np.ndarray):
    """(bit marginals[64], adjacent-in-row correlations, cross-row
    correlations, per-band collision rate over all unrelated pairs)."""
    bits = ((hashes[:, None].astype(np.uint64) >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.float64
    )
    marg = bits.mean(axis=0)
    centered = bits - marg[None, :]
    sd = bits.std(axis=0) + 1e-12
    corr = (centered.T @ centered) / len(bits) / np.outer(sd, sd)
    # bit index b of the VALUE is position 63-b of the MSB-first build:
    # row r, gradient j (0-indexed) sits at value-bit 63 - (8r + j)
    adj, cross = [], []
    for r in range(8):
        for j in range(7):
            adj.append(corr[63 - (8 * r + j), 63 - (8 * r + j + 1)])
        if r < 7:
            cross.append(corr[63 - (8 * r + 7), 63 - (8 * (r + 1))])
    bands = (
        hashes[:, None].astype(np.uint64)
        >> (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :]
    ) & np.uint64(0xFFFF)
    n = len(hashes)
    collisions = sum(
        int((bands[:, b][:, None] == bands[:, b][None, :]).sum() - n) // 2
        for b in range(4)
    )
    rate = collisions / (4 * n * (n - 1) / 2)
    return marg, np.array(adj), np.array(cross), rate


_DHASH_BAND_COLLISION_THEORY = (0.5 * (5.0 / 9.0) ** 7) ** 2  # ≈ 6.67e-5


def test_dhash_band_theory_on_noise_images():
    """Noise-image pins: bit marginals ½ ± 0.08 (4σ at n=800), adjacent
    same-row correlation −1/3 ± 0.12, cross-row ≈ 0 ± 0.12, and the
    per-band key-collision rate within [0.3×, 3×] of the Markov theory
    value (Poisson noise on ~85 expected collisions spans far less)."""
    rng = np.random.default_rng(7)
    imgs = [
        rng.integers(0, 256, (24, 27, 3), dtype=np.uint8) for _ in range(800)
    ]
    marg, adj, cross, rate = _dhash_band_stats(_dhash_family(imgs))
    assert marg.min() > 0.42 and marg.max() < 0.58, (marg.min(), marg.max())
    assert abs(adj.mean() - (-1.0 / 3.0)) < 0.12, adj.mean()
    assert np.abs(cross).max() < 0.12, np.abs(cross).max()
    lo, hi = 0.3 * _DHASH_BAND_COLLISION_THEORY, 3.0 * _DHASH_BAND_COLLISION_THEORY
    assert lo < rate < hi, (rate, _DHASH_BAND_COLLISION_THEORY)


def test_dhash_pin_fails_on_degenerate_family():
    """Monotone-gradient images (brightness strictly increasing left to
    right — the constant-structure worst case): every gradient
    comparison points the same way, all 64 bits saturate at 1, every
    band key collapses into ONE bucket, and the measured collision rate
    blows past the tolerance by >1000× — the exact quadratic-join
    failure the noise pin guards against."""
    rng = np.random.default_rng(11)
    imgs = []
    for _ in range(200):
        base = np.linspace(10, 240, 27)[None, :, None] + rng.normal(
            0, 1.0, (24, 27, 1)
        )
        imgs.append(
            np.clip(base, 0, 255).astype(np.uint8).repeat(3, axis=2)
        )
    marg, adj, cross, rate = _dhash_band_stats(_dhash_family(imgs))
    assert marg.mean() > 0.9  # saturated bits, nowhere near ½
    assert rate > 1000 * _DHASH_BAND_COLLISION_THEORY, rate
