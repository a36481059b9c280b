"""Clustered-geometry re-measure of the quantized pair prescreen
(round-11/13 carried item). Round 11 showed the PROVABLE-no-false-
negative PQ gate keeps 100% of pairs on the synthetic embeddings —
they are isotropic unit vectors, so PQ residuals (~0.77 per unit
vector) make the slack larger than the whole cosine range and the gate
can never exclude a pair. Open question: does the gate bite on the
geometry real corpora have — CLUSTERED unit vectors — and at what
tightness should production wire it in?

Fixture: mixture of C Gaussians on the unit sphere (centers drawn
once, seeded; points = normalize(center + sigma * noise)), swept over
sigma. Gate: m-subspace PQ codebooks (per-subspace Lloyd, seeded);
for unit vectors cos(a,b) = dot(a,b) and
  |dot(a,b) - dot(a_hat, b_hat)|
      <= |a_hat||r_b| + |r_a||b_hat| + |r_a||r_b|   (Cauchy-Schwarz)
so keeping pairs with dot(a_hat, b_hat) + slack_ab >= tau is LOSSLESS
(zero false negatives) by construction; the artifact records the keep
fraction — the fraction of the exact-verify work the gate would leave.

Pure-numpy driver experiment (geometry measurement, not an operator);
the production wiring decision it informs is in
extensions/similarity.py's block pair join.

Usage: python tools/prescreen_clustered.py [out_json]
"""

from __future__ import annotations

import json
import sys

import numpy as np

N = 2000
D = 64
M = 8  # PQ subspaces
KSUB = 16  # codewords per subspace
LLOYD = 5
TAU = 0.30
N_CLUSTERS = 16
SEED = 13


def make_mixture(rng, sigma: float) -> np.ndarray:
    centers = rng.normal(size=(N_CLUSTERS, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, N_CLUSTERS, size=N)
    pts = centers[assign] + sigma * rng.normal(size=(N, D))
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def pq_fit_encode(rng, x: np.ndarray) -> np.ndarray:
    """Per-subspace Lloyd; returns the reconstruction x_hat."""
    sub = D // M
    recon = np.empty_like(x)
    for m in range(M):
        xs = x[:, m * sub : (m + 1) * sub]
        cents = xs[rng.choice(len(xs), KSUB, replace=False)]
        for _ in range(LLOYD):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for k in range(KSUB):
                mask = a == k
                if mask.any():
                    cents[k] = xs[mask].mean(axis=0)
        d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        recon[:, m * sub : (m + 1) * sub] = cents[d2.argmin(axis=1)]
    return recon


def measure(sigma: float) -> dict:
    rng = np.random.default_rng(SEED)
    x = make_mixture(rng, sigma)
    x_hat = pq_fit_encode(rng, x)
    r = x - x_hat
    rn = np.linalg.norm(r, axis=1)
    hn = np.linalg.norm(x_hat, axis=1)

    # sampled pair grid (every pair of the first 500 x all: ~1M pairs
    # is overkill; a deterministic 700x700 block ~ 245k ordered pairs)
    idx = np.arange(700)
    a, b = np.meshgrid(idx, idx, indexing="ij")
    mask = a < b
    ai, bi = a[mask], b[mask]
    dot_true = np.einsum("ij,ij->i", x[ai], x[bi])
    dot_hat = np.einsum("ij,ij->i", x_hat[ai], x_hat[bi])
    slack = hn[ai] * rn[bi] + rn[ai] * hn[bi] + rn[ai] * rn[bi]
    keep = dot_hat + slack >= TAU
    positives = dot_true >= TAU
    # soundness: the gate must never drop a true positive
    false_neg = int((positives & ~keep).sum())
    return {
        "sigma": sigma,
        "mean_residual_norm": round(float(rn.mean()), 4),
        "mean_slack": round(float(slack.mean()), 4),
        "pairs": int(mask.sum()),
        "true_pos_fraction": round(float(positives.mean()), 5),
        "keep_fraction": round(float(keep.mean()), 5),
        "false_negatives": false_neg,
        "verify_work_saved": round(float(1.0 - keep.mean()), 5),
    }


def main() -> None:
    out_json = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "experiments/SEMDEDUP_PRESCREEN_r13.json"
    )
    sweeps = [measure(s) for s in (0.02, 0.05, 0.1, 0.2, 0.4, 0.8)]
    biting = [s for s in sweeps if s["verify_work_saved"] >= 0.5]
    out = {
        "question": (
            "does the provable-slack PQ prescreen bite on CLUSTERED "
            "unit-normed geometry (r11 showed it keeps 100% on "
            "isotropic unit vectors), and at what residual tightness "
            "should production wire it in?"
        ),
        "fixture": {
            "n": N,
            "dims": D,
            "clusters": N_CLUSTERS,
            "pq": {"m": M, "k_per_subspace": KSUB, "lloyd": LLOYD},
            "threshold": TAU,
        },
        "sweep": sweeps,
        "gate_rule": (
            "wire the prescreen only when the fitted quantizer's mean "
            "residual norm makes it worth the extra pass: "
            f"residual <= {biting[-1]['mean_residual_norm'] if biting else 'n/a'} "
            "(the largest swept sigma still saving >=50% of exact "
            "verifies). Above that the slack swamps the cosine range "
            "and the gate degenerates to keep-everything — exactly the "
            "r11 isotropic finding."
        ),
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"sweep": sweeps}, indent=1))
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
