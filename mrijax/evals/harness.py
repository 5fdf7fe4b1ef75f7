"""Evaluation harness reproducing the reference's metrics.json protocol.

Protocol parity with `slice_cond_2d_ddpm/metrics.py:232-523` /
`evaluation_scripts/metrics.py`:

* volume-level test split (no slice leakage) — ``volume_split_indices``;
* stream real test slices; for each real batch, sample fakes at the SAME
  z conditions; update global + per-z-bin (8 bins over [0,1]) FID/KID
  accumulators;
* diversity: pairs of independent generations at the same z → SSIM, plus
  AlexNet-LPIPS when an ``lpips`` distance is supplied (metrics.py:419-443)
  — otherwise a feature-space cosine stand-in labeled ``feat_dist``;
* optional improved precision/recall, on ResNet18 features when a
  ``pr_feature_extractor`` is supplied (metrics.py:147-229), else on the
  FID features;
* metric names carry the extractor's ``metric_suffix``: "" for converted
  ImageNet weights (``fid``/``kid`` comparable to BASELINE.md), "_rand"
  for the offline seeded-random extractor;
* memorization stats of fakes vs a real pool;
* writes ``metrics.json`` with the reference's key layout.

The sampling loop dominates cost exactly as in the reference (§3.5); use
``ddim_steps`` for the fast path.
"""

import json
import time
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mrijax.evals.features import FeatureExtractor
from mrijax.evals.frechet import FidAccumulator, frechet_distance, kid_from_features
from mrijax.evals.memorization import memorization_stats
from mrijax.evals.prd import improved_precision_recall
from mrijax.evals.ssim import ssim

NUM_Z_BINS = 8


def _bin_of(z: np.ndarray, num_bins: int = NUM_Z_BINS) -> np.ndarray:
    return np.clip((np.asarray(z) * num_bins).astype(int), 0, num_bins - 1)


def evaluate_conditional_2d(
    sample_fn: Callable,
    real_iter,
    *,
    feature_extractor: Optional[FeatureExtractor] = None,
    pr_feature_extractor=None,
    lpips=None,
    num_samples: int = 1000,
    num_diversity_pairs: int = 64,
    compute_pr: bool = False,
    memorization_pool: int = 2000,
    seed: int = 0,
    eval_channel: Optional[int] = None,
    out_path=None,
    progress_path=None,
    metadata: Optional[dict] = None,
) -> dict:
    """Evaluate a conditional 2D sampler against real data.

    ``sample_fn(batch, key) -> (B, H, W, C) fakes in [-1, 1]`` — the batch
    dict carries whatever conditioning the model needs (z_pos for the 2D
    model; z_pos + context for the 2.5D model). ``real_iter`` yields dicts
    with at least "image" (B, H, W, C) and "z_pos" (B,).

    ``eval_channel`` selects one channel of both real and fake images before
    feature extraction for multichannel (2.5D) models — the reference's
    ``eval_channel`` (`metrics_both.py:178-189`).
    """
    fe = feature_extractor or FeatureExtractor()
    sfx = getattr(fe, "metric_suffix", "_rand")
    key = jax.random.PRNGKey(seed)

    def select(img):
        if eval_channel is None:
            return img
        return img[..., eval_channel : eval_channel + 1]

    global_real = FidAccumulator(fe.dim)
    global_fake = FidAccumulator(fe.dim)
    bin_real = [FidAccumulator(fe.dim) for _ in range(NUM_Z_BINS)]
    bin_fake = [FidAccumulator(fe.dim) for _ in range(NUM_Z_BINS)]
    real_feats_all, fake_feats_all = [], []
    real_pool, fake_pool = [], []
    # PR runs on its own feature space (ResNet18); embed each real batch as
    # it streams by and keep only the feature vectors — the real side must
    # NOT inherit the memorization cap (precision/recall would compare
    # ~2000 real vs num_samples fake manifolds), and holding raw images
    # instead of features would cost GBs at large num_samples
    embed_pr = compute_pr and pr_feature_extractor is not None
    real_feats_pr = []

    n_seen = 0
    t0 = time.time()
    div_batch = None
    for batch in real_iter:
        if n_seen >= num_samples:
            break
        take = min(num_samples - n_seen, np.asarray(batch["image"]).shape[0])
        batch = {k: np.asarray(v)[:take] for k, v in batch.items()}
        real = select(batch["image"])
        z = batch["z_pos"]
        key, sub = jax.random.split(key)
        fake = select(np.asarray(sample_fn(batch, sub)))

        rf = np.asarray(fe(real))
        ff = np.asarray(fe(fake))
        global_real.update(rf)
        global_fake.update(ff)
        for b in range(NUM_Z_BINS):
            m = _bin_of(z) == b
            if m.any():
                bin_real[b].update(rf[m])
                bin_fake[b].update(ff[m])
        real_feats_all.append(rf)
        fake_feats_all.append(ff)
        if len(real_pool) * real.shape[0] < memorization_pool:
            real_pool.append(real)
        if embed_pr:
            real_feats_pr.append(np.asarray(pr_feature_extractor(real)))
        fake_pool.append(fake)
        if div_batch is None:
            div_batch = batch  # reuse the first batch's conditions
        n_seen += real.shape[0]
        if progress_path is not None:
            # mid-model breadcrumb so a long eval (sampling dominates, §3.5)
            # is observable from outside, like the reference's
            # *_progress.txt (`metrics_both.py:389`)
            Path(progress_path).write_text(
                f"{n_seen}/{num_samples} samples  "
                f"{time.time() - t0:.0f}s elapsed  {time.ctime()}\n"
            )

    report: dict = {"num_samples": n_seen, "protocol": "matched-z streaming"}
    # caller-supplied provenance (e.g. which sampler generated the fakes —
    # the reference can only do the full-T ancestral protocol,
    # `metrics.py:355`; a fast-mode report must say so in its JSON)
    report.update(metadata or {})
    mu_r, cov_r = global_real.stats()
    mu_f, cov_f = global_fake.stats()
    report[f"fid{sfx}"] = frechet_distance(mu_r, cov_r, mu_f, cov_f)
    rfa = np.concatenate(real_feats_all)
    ffa = np.concatenate(fake_feats_all)
    kid_mean, kid_std = kid_from_features(
        rfa, ffa, subset_size=min(1000, n_seen), num_subsets=100, seed=seed
    )
    report[f"kid{sfx}_mean"], report[f"kid{sfx}_std"] = kid_mean, kid_std

    report[f"fid{sfx}_per_z_bin"] = {}
    for b in range(NUM_Z_BINS):
        if bin_real[b].n >= 2 and bin_fake[b].n >= 2:
            report[f"fid{sfx}_per_z_bin"][str(b)] = frechet_distance(
                *bin_real[b].stats(), *bin_fake[b].stats()
            )

    # diversity: two generations at identical conditions
    if div_batch is not None and num_diversity_pairs > 0:
        db = {k: v[:num_diversity_pairs] for k, v in div_batch.items()}
        k1, k2 = jax.random.split(jax.random.fold_in(key, 999))
        g1 = select(np.asarray(sample_fn(db, k1)))
        g2 = select(np.asarray(sample_fn(db, k2)))
        # reference protocol rescales to [0,1] with data_range=1 before
        # SSIM (metrics.py:433-436) — SSIM is not shift-invariant, so
        # scoring the raw [-1,1] samples would not be comparable
        g1_01 = np.clip((g1 + 1.0) / 2.0, 0.0, 1.0)
        g2_01 = np.clip((g2 + 1.0) / 2.0, 0.0, 1.0)
        s = np.asarray(ssim(g1_01, g2_01, data_range=1.0))
        report["diversity_ssim_mean"] = float(s.mean())
        report["diversity_ssim_std"] = float(s.std())
        if lpips is not None:
            lsfx = "" if getattr(lpips, "is_pretrained", False) else "_rand"
            d = np.asarray(lpips(g1, g2))
            report[f"diversity_lpips{lsfx}_mean"] = float(d.mean())
            report[f"diversity_lpips{lsfx}_std"] = float(d.std())
        else:
            f1, f2 = np.asarray(fe(g1)), np.asarray(fe(g2))
            cos = np.sum(f1 * f2, axis=1) / np.maximum(
                np.linalg.norm(f1, axis=1) * np.linalg.norm(f2, axis=1), 1e-12
            )
            report["diversity_feat_dist_mean"] = float((1 - cos).mean())
            report["diversity_feat_dist_std"] = float((1 - cos).std())

    if compute_pr:
        if pr_feature_extractor is not None:
            # re-embed the pools with the PR extractor (ResNet18 features,
            # metrics.py:147-229) — PR runs on a different feature space
            # than FID by design
            prf = pr_feature_extractor
            rfa_pr = np.concatenate(real_feats_pr)
            ffa_pr = prf.embed_batched(np.concatenate(fake_pool))
            p, r = improved_precision_recall(rfa_pr, ffa_pr)
            psfx = getattr(prf, "metric_suffix", "_rand")
            report["improved_pr_feature_space"] = "resnet18"
        else:
            # FALLBACK: FID-space features, a DIFFERENT metric than the
            # reference's ResNet18-space PR — record the space explicitly
            # so the fallback is visible beyond the suffix
            p, r = improved_precision_recall(rfa, ffa)
            psfx = sfx
            report["improved_pr_feature_space"] = f"fid_features{sfx}"
        report[f"improved_precision{psfx}"] = p
        report[f"improved_recall{psfx}"] = r

    fakes = np.concatenate(fake_pool)[:memorization_pool]
    reals = np.concatenate(real_pool)[:memorization_pool]
    report["memorization"] = memorization_stats(fakes, reals)
    report["eval_seconds"] = time.time() - t0

    if out_path is not None:
        out_path = Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(json.dumps(report, indent=2))
    return report
