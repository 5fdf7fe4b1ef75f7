"""Composed-metric equivalence against the reference's LITERAL metric math.

The strongest FID/KID-parity evidence this data-less, weight-less
environment permits: the reference's own formulas — scipy-sqrtm FID with
the eps-offset retry (`evaluation_scripts/evaluate_models.py:195-218`),
single-shot unbiased polynomial-kernel KID (:221-277), and the
torchmetrics MMD² estimator convention used by
`slice_cond_2d_ddpm/metrics.py:329-343` — are re-expressed here as
test-side oracles and run on the SAME feature matrices as
``mrijax.evals.frechet``, asserting agreement to ≤1e-6. A composed test
then drives ``evaluate_conditional_2d``'s full streaming protocol
(matched-z, per-bin accumulators, KID subset schedule) against an offline
replica of the reference loop (`metrics.py:347-395`) on identical injected
sampler outputs and asserts identical report numbers.

This closes the seam left by the converter-boundary parity tests: "our
Fréchet matches closed forms" + "our backbone matches a torch replica"
now composes into "our pipeline numbers equal the reference pipeline's
numbers on shared inputs".
"""

import json

import numpy as np
import pytest
from scipy import linalg

from mrijax.evals import evaluate_conditional_2d
from mrijax.evals.frechet import (
    FidAccumulator,
    _mmd2_unbiased,
    _poly_kernel,
    fid_from_features,
    frechet_distance,
    kid_from_features,
)

# --------------------------------------------------------------- oracles
# Test-side re-expressions of the reference formulas (cited above). They
# exist ONLY to prove equivalence; the package's implementations are the
# independent eigh/streaming designs in mrijax/evals/frechet.py.


def _ref_fid(real_feats, fake_feats, eps=1e-6):
    """evaluate_models.py:195-218 — np.cov + scipy sqrtm + eps retry."""
    mu_r, mu_f = real_feats.mean(axis=0), fake_feats.mean(axis=0)
    s_r = np.cov(real_feats, rowvar=False)
    s_f = np.cov(fake_feats, rowvar=False)
    diff = mu_r - mu_f
    covmean, _ = linalg.sqrtm(s_r.dot(s_f), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(s_r.shape[0]) * eps
        covmean = linalg.sqrtm((s_r + offset).dot(s_f + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(s_r + s_f - 2.0 * covmean))


def _ref_kid_single(real_feats, fake_feats, max_samples=2000):
    """evaluate_models.py:221-277 — one unbiased MMD² over ≤max_samples
    (rng(42) subsample), diagonal removed via fill_diagonal."""
    rng = np.random.default_rng(42)
    n, m = real_feats.shape[0], fake_feats.shape[0]
    if n > max_samples:
        real_feats = real_feats[rng.choice(n, size=max_samples, replace=False)]
        n = max_samples
    if m > max_samples:
        fake_feats = fake_feats[rng.choice(m, size=max_samples, replace=False)]
        m = max_samples
    gamma = 1.0 / real_feats.shape[1]

    def k(a, b):
        return (gamma * a.dot(b.T) + 1.0) ** 3

    k_xx, k_yy, k_xy = k(real_feats, real_feats), k(fake_feats, fake_feats), k(
        real_feats, fake_feats
    )
    np.fill_diagonal(k_xx, 0.0)
    np.fill_diagonal(k_yy, 0.0)
    return float(
        k_xx.sum() / (n * (n - 1))
        + k_yy.sum() / (m * (m - 1))
        - 2.0 * k_xy.mean()
    )


def _torchmetrics_mmd2(x, y):
    """torchmetrics.image.kid's maximum_mean_discrepancy on equal-size
    subsets — the estimator behind `metrics.py:330-335`'s
    KernelInceptionDistance(subsets=100, subset_size=1000)."""
    import torch

    x, y = torch.as_tensor(x, dtype=torch.float64), torch.as_tensor(
        y, dtype=torch.float64
    )
    m = x.shape[0]
    gamma = 1.0 / x.shape[1]
    k_xx = (gamma * x @ x.t() + 1.0) ** 3
    k_yy = (gamma * y @ y.t() + 1.0) ** 3
    k_xy = (gamma * x @ y.t() + 1.0) ** 3
    kt_xx_sum = (k_xx.sum(dim=-1) - k_xx.diag()).sum()
    kt_yy_sum = (k_yy.sum(dim=-1) - k_yy.diag()).sum()
    value = (kt_xx_sum + kt_yy_sum) / (m * (m - 1))
    value -= 2 * k_xy.sum() / (m * m)
    return float(value)


def _features(seed, n, d, shift=0.0, scale=1.0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d))
    mix = rng.normal(size=(d, d)) * 0.3 + np.eye(d)
    return (base @ mix) * scale + shift


# ------------------------------------------------- formula-level parity


@pytest.mark.parametrize("seed,shift,scale", [(0, 0.0, 1.0), (1, 0.5, 1.3),
                                              (2, -0.2, 0.7), (3, 2.0, 2.0)])
def test_fid_matches_reference_sqrtm(seed, shift, scale):
    real = _features(seed, 500, 16)
    fake = _features(seed + 100, 400, 16, shift=shift, scale=scale)
    ours = fid_from_features(real, fake)
    ref = _ref_fid(real, fake)
    assert ours == pytest.approx(ref, rel=1e-9, abs=1e-6)


def test_fid_matches_reference_near_singular():
    """Low-rank features (n-1 < d would be fully singular; here a strongly
    anisotropic case) — the regime that forces the reference's eps retry.
    The eigh route stays finite and agrees."""
    rng = np.random.default_rng(7)
    lowrank = rng.normal(size=(300, 4)) @ rng.normal(size=(4, 16))
    real = lowrank + 1e-6 * rng.normal(size=(300, 16))
    fake = real * 1.1 + 0.05
    ours = fid_from_features(real, fake)
    ref = _ref_fid(real, fake)
    assert np.isfinite(ours) and np.isfinite(ref)
    assert ours == pytest.approx(ref, rel=1e-4, abs=1e-6)


def test_fid_streaming_equals_reference_offline():
    """FidAccumulator streamed over uneven batches == np.cov (ddof=1) path
    of the reference, composed through frechet_distance."""
    real = _features(11, 333, 12)
    fake = _features(12, 287, 12, shift=0.3)
    a, b = FidAccumulator(12), FidAccumulator(12)
    for i in range(0, 333, 50):
        a.update(real[i : i + 50])
    for i in range(0, 287, 64):
        b.update(fake[i : i + 64])
    ours = frechet_distance(*a.stats(), *b.stats())
    assert ours == pytest.approx(_ref_fid(real, fake), rel=1e-9, abs=1e-6)


def test_kid_single_shot_matches_reference():
    """Our unbiased MMD² on the full sets == the reference's
    _compute_kid_from_features (no subsampling at n,m ≤ max_samples) —
    including unequal n ≠ m."""
    real = _features(20, 180, 10)
    fake = _features(21, 150, 10, shift=0.2)
    ours = _mmd2_unbiased(
        _poly_kernel(real, real), _poly_kernel(fake, fake),
        _poly_kernel(real, fake),
    )
    assert ours == pytest.approx(_ref_kid_single(real, fake), rel=1e-9,
                                 abs=1e-12)


def test_kid_reference_subsample_path():
    """n > max_samples engages the reference's rng(42) subsample; feeding
    our estimator the same subsampled matrices reproduces it exactly."""
    real = _features(30, 120, 8)
    fake = _features(31, 130, 8, shift=0.1)
    ref = _ref_kid_single(real, fake, max_samples=100)
    rng = np.random.default_rng(42)
    r = real[rng.choice(120, size=100, replace=False)]
    f = fake[rng.choice(130, size=100, replace=False)]
    ours = _mmd2_unbiased(
        _poly_kernel(r, r), _poly_kernel(f, f), _poly_kernel(r, f)
    )
    assert ours == pytest.approx(ref, rel=1e-9, abs=1e-12)


def test_kid_estimator_matches_torchmetrics_formula():
    """Per-subset estimator == torchmetrics' maximum_mean_discrepancy on
    identical subsets (the convention behind subsets=100/subset_size=1000
    in `metrics.py:330-335`). RNG differs between libraries, so the
    estimator — not the draw — is the invariant to pin."""
    torch = pytest.importorskip("torch")  # noqa: F841
    for seed in range(3):
        r = _features(40 + seed, 64, 8)
        f = _features(50 + seed, 64, 8, shift=0.15)
        ours = _mmd2_unbiased(
            _poly_kernel(r, r), _poly_kernel(f, f), _poly_kernel(r, f)
        )
        assert ours == pytest.approx(_torchmetrics_mmd2(r, f), rel=1e-9,
                                     abs=1e-12)


def test_kid_subset_protocol_pinned():
    """kid_from_features' subset schedule (size=min(1000,n) without
    replacement, real-then-fake draw order, mean±std over subsets) equals
    an independent replica with the same seed — so the harness's
    `subset_size=min(1000, n)` / `num_subsets=100` calls (harness.py) are
    reproducible by anyone holding the feature matrices."""
    real = _features(60, 90, 8)
    fake = _features(61, 110, 8, shift=0.25)
    mean, std = kid_from_features(real, fake, subset_size=50, num_subsets=25,
                                  seed=123)
    rng = np.random.default_rng(123)
    vals = []
    for _ in range(25):
        r = real[rng.choice(90, 50, replace=False)]
        f = fake[rng.choice(110, 50, replace=False)]
        vals.append(_ref_kid_single(r, f))  # no resample at n==max? n<2000
    assert mean == pytest.approx(float(np.mean(vals)), rel=1e-9, abs=1e-12)
    assert std == pytest.approx(float(np.std(vals)), rel=1e-9, abs=1e-12)


# ------------------------------------------- composed streaming protocol


class _ProjFeatures:
    """Deterministic linear feature map (fixed Gaussian projection) — a
    stand-in extractor with a well-conditioned 6-d covariance so sqrtm and
    eigh agree to machine precision."""

    dim = 6
    metric_suffix = "_rand"

    def __init__(self, pixels):
        self._p = np.random.default_rng(0).normal(size=(pixels, self.dim))

    def __call__(self, img):
        x = np.asarray(img, np.float64).reshape(np.asarray(img).shape[0], -1)
        return x @ self._p


def test_streaming_harness_equals_reference_protocol(tmp_path):
    """evaluate_conditional_2d's composed numbers (global FID, per-z-bin
    FID, KID mean/std) == an offline replica of the reference streaming
    loop (`metrics.py:347-395` + `evaluate_models.py:195-277`) on the SAME
    injected sampler outputs and the SAME feature extractor."""
    size, nb, bs = 8, 6, 8
    fe = _ProjFeatures(size * size)
    rng = np.random.default_rng(5)
    batches = []
    for i in range(nb):
        img = rng.normal(scale=0.5, size=(bs, size, size, 1)).astype(np.float32)
        # z away from bin edges (the reference buckets edge values down,
        # ours up — measure-zero for continuous z, avoided here)
        z = (rng.uniform(0.02, 0.98, size=(bs,)) * 0.999).astype(np.float32)
        batches.append({"image": img, "z_pos": z})

    def sample_fn(batch, key):  # deterministic: fake = 0.8*real + 0.07
        return np.asarray(batch["image"]) * 0.8 + 0.07

    n_total = nb * bs
    report = evaluate_conditional_2d(
        sample_fn, iter([dict(b) for b in batches]), feature_extractor=fe,
        num_samples=n_total, num_diversity_pairs=0, compute_pr=False,
        seed=9, out_path=tmp_path / "metrics.json",
    )

    # ---- offline reference replica over the identical stream
    real_f, fake_f = [], []
    bin_real = [[] for _ in range(8)]
    bin_fake = [[] for _ in range(8)]
    for b in batches:
        rf = fe(b["image"])
        ff = fe(sample_fn(b, None))
        real_f.append(rf)
        fake_f.append(ff)
        # binning replica uses the reference's LITERAL torch.bucketize
        # convention (`metrics.py:370` with edges = linspace(0,1,9)) when
        # torch is available, falling back to the equivalent int(z*8)
        try:
            import torch

            edges = torch.linspace(0.0, 1.0, 9)
            bins = torch.bucketize(
                torch.as_tensor(np.asarray(b["z_pos"])), edges[1:-1],
                right=False,
            ).numpy()
        except ImportError:  # pragma: no cover
            bins = np.minimum((np.asarray(b["z_pos"]) * 8).astype(int), 7)
        for i, bi in enumerate(bins):
            bin_real[bi].append(rf[i])
            bin_fake[bi].append(ff[i])
    rfa, ffa = np.concatenate(real_f), np.concatenate(fake_f)

    assert report["num_samples"] == n_total
    assert report["fid_rand"] == pytest.approx(_ref_fid(rfa, ffa), rel=1e-9,
                                               abs=1e-9)
    for bi, fid_b in report["fid_rand_per_z_bin"].items():
        r = np.stack(bin_real[int(bi)])
        f = np.stack(bin_fake[int(bi)])
        # ~6 samples per bin make the 6-d per-bin covariance singular —
        # the regime where sqrtm (oracle) and eigh (ours) differ at ~1e-7
        # relative; the formula-level singular case is pinned above
        assert fid_b == pytest.approx(_ref_fid(r, f), rel=1e-5, abs=1e-6)
    # bins with <2 samples are absent on both sides
    for bi in range(8):
        if str(bi) not in report["fid_rand_per_z_bin"]:
            assert len(bin_real[bi]) < 2

    # KID: harness protocol = subset_size=min(1000,n), num_subsets=100,
    # seed=<eval seed>, real-then-fake draws — replicated independently
    rng2 = np.random.default_rng(9)
    m = min(1000, n_total)
    vals = []
    for _ in range(100):
        r = rfa[rng2.choice(n_total, m, replace=False)]
        f = ffa[rng2.choice(n_total, m, replace=False)]
        vals.append(_ref_kid_single(r, f))
    assert report["kid_rand_mean"] == pytest.approx(float(np.mean(vals)),
                                                    rel=1e-9, abs=1e-12)
    assert report["kid_rand_std"] == pytest.approx(float(np.std(vals)),
                                                   rel=1e-9, abs=1e-12)

    # the numbers on disk are the numbers returned
    on_disk = json.loads((tmp_path / "metrics.json").read_text())
    assert on_disk["fid_rand"] == report["fid_rand"]


def test_z_bin_assignment_matches_bucketize():
    """Pins the z-bin convention delta documented in PARITY.md §2.7:
    `harness._bin_of` (clip(int(z*8))) equals the reference's
    `torch.bucketize(z, linspace(0,1,9)[1:-1], right=False)`
    (`slice_cond_2d_ddpm/metrics.py:368-371`) for every interior value,
    and differs ONLY on exact bin edges (we bucket up, torch buckets
    down) — a measure-zero set for continuous z."""
    torch = pytest.importorskip("torch")
    from mrijax.evals.harness import NUM_Z_BINS, _bin_of

    edges = torch.linspace(0.0, 1.0, NUM_Z_BINS + 1)
    rng = np.random.default_rng(0)
    z_interior = rng.uniform(0.0, 1.0, size=4096)
    # keep away from exact edges (float64 uniform never hits them anyway,
    # but make it explicit)
    z_interior = z_interior[
        np.abs(z_interior * NUM_Z_BINS - np.round(z_interior * NUM_Z_BINS))
        > 1e-9
    ]
    ours = _bin_of(z_interior)
    ref = torch.bucketize(
        torch.from_numpy(z_interior), edges[1:-1], right=False
    ).numpy()
    np.testing.assert_array_equal(ours, ref)

    # exact edge values: ref puts them in the LOWER bin, we in the UPPER
    z_edges = np.arange(1, NUM_Z_BINS) / NUM_Z_BINS  # 0.125 .. 0.875
    ours_e = _bin_of(z_edges)
    ref_e = torch.bucketize(torch.from_numpy(z_edges), edges[1:-1],
                            right=False).numpy()
    np.testing.assert_array_equal(ours_e, ref_e + 1)
    # endpoints agree (0 → bin 0, 1.0 → clipped to last bin both sides)
    assert _bin_of(np.array([0.0]))[0] == 0
    assert _bin_of(np.array([1.0]))[0] == NUM_Z_BINS - 1
