"""Standalone t-SNE over dumped features.

Reference: ``utils/run_tsne.py`` (MulticoreTSNE over get_feat dumps with
Diving48 grouping). Uses sklearn's TSNE (MulticoreTSNE is not in this
image); input is the .npz written by ``utils.visualization.get_features``.

Usage: python -m advise_tpu.tools.run_tsne --features feats.npz \
           --output tsne.png [--perplexity 30] [--max-points 5000]
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

logger = logging.getLogger(__name__)


def run_tsne(features, labels, perplexity=30.0, seed=0):
    from sklearn.manifold import TSNE

    emb = TSNE(
        n_components=2,
        perplexity=min(perplexity, max((len(features) - 1) / 3.0, 2.0)),
        init="pca",
        random_state=seed,
    ).fit_transform(features)
    return emb


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--features", required=True)
    parser.add_argument("--output", default="tsne.png")
    parser.add_argument("--perplexity", type=float, default=30.0)
    parser.add_argument("--max-points", type=int, default=5000)
    args = parser.parse_args(argv)

    data = np.load(args.features)
    feats, labels = data["features"], data["labels"]
    if len(feats) > args.max_points:
        idx = np.random.default_rng(0).choice(
            len(feats), args.max_points, replace=False
        )
        feats, labels = feats[idx], labels[idx]
    emb = run_tsne(feats, labels, args.perplexity)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 8))
    plt.scatter(emb[:, 0], emb[:, 1], c=labels, cmap="tab20", s=4, alpha=0.7)
    plt.axis("off")
    plt.tight_layout()
    plt.savefig(args.output, dpi=150)
    print(f"t-SNE written to {args.output}")


if __name__ == "__main__":
    main()
