"""Adjacency template geometry and zoom sub-region division.

Reference equivalent (SURVEY.md §2.1 "Proposal generation"): the K≈11
adjacency templates (sub-/neighboring-window anchors each region predicts
against) and the "divide into overlapping sub-regions (quadrants + center at
half size)" rule of the AZ paper (arXiv:1512.07711 §3). The exact reference
geometry could not be read (empty mount — SURVEY.md §0); the template table
below is the paper-described set and is DATA, not code: swap the table to
match the reference bit-for-bit once its config is readable. The network
regresses deltas against these anchors, so training and search are
self-consistent for any fixed table.

Templates are normalized boxes (x1, y1, x2, y2) in the region's unit frame;
division children likewise. All functions are pure jnp, broadcastable over
leading dims.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# K = 11 adjacency templates: full region, 4 halves, 4 quadrants, center,
# and a 1.5x context window (the "neighboring region" prediction).
_TEMPLATES_11 = np.array(
    [
        [0.00, 0.00, 1.00, 1.00],  # whole region
        [0.00, 0.00, 0.50, 1.00],  # left half
        [0.50, 0.00, 1.00, 1.00],  # right half
        [0.00, 0.00, 1.00, 0.50],  # top half
        [0.00, 0.50, 1.00, 1.00],  # bottom half
        [0.00, 0.00, 0.50, 0.50],  # TL quadrant
        [0.50, 0.00, 1.00, 0.50],  # TR quadrant
        [0.00, 0.50, 0.50, 1.00],  # BL quadrant
        [0.50, 0.50, 1.00, 1.00],  # BR quadrant
        [0.25, 0.25, 0.75, 0.75],  # center
        [-0.25, -0.25, 1.25, 1.25],  # 1.5x context / neighbors
    ],
    dtype=np.float32,
)

# Zoom division: 5 sub-regions at half size — 4 quadrants + center
# (AZ paper §3: overlapping sub-regions; DIV_OVERLAP grows them).
_DIVISIONS = np.array(
    [
        [0.00, 0.00, 0.50, 0.50],
        [0.50, 0.00, 1.00, 0.50],
        [0.00, 0.50, 0.50, 1.00],
        [0.50, 0.50, 1.00, 1.00],
        [0.25, 0.25, 0.75, 0.75],
    ],
    dtype=np.float32,
)

NUM_DIVISIONS = len(_DIVISIONS)


def adjacency_templates_np(k: int = 11) -> np.ndarray:
    """The (K, 4) normalized template table as host NumPy.

    Host-side consumers (label generation, minibatch prep) MUST use this
    variant: the jnp one materializes on the accelerator, and fetching it
    back per minibatch costs a device round-trip on remote backends.
    """
    if k <= len(_TEMPLATES_11):
        return _TEMPLATES_11[:k]
    raise ValueError(f"no template table with K={k}")


def adjacency_templates(k: int = 11) -> jnp.ndarray:
    """The (K, 4) normalized template table (device array)."""
    return jnp.asarray(adjacency_templates_np(k))


def _apply_normalized(regions, table, offset: float):
    """Map normalized boxes in each region frame to image coords.

    regions: [..., 4]; table: [K, 4] -> [..., K, 4] (inclusive-coord boxes
    under ``offset``; continuous coords for offset=0).
    """
    w = regions[..., 2] - regions[..., 0] + offset
    h = regions[..., 3] - regions[..., 1] + offset
    x1 = regions[..., 0]
    y1 = regions[..., 1]
    tx1, ty1, tx2, ty2 = table[:, 0], table[:, 1], table[:, 2], table[:, 3]
    ax1 = x1[..., None] + tx1 * w[..., None]
    ay1 = y1[..., None] + ty1 * h[..., None]
    ax2 = x1[..., None] + tx2 * w[..., None] - offset
    ay2 = y1[..., None] + ty2 * h[..., None] - offset
    return jnp.stack([ax1, ay1, ax2, ay2], axis=-1)


def template_boxes(regions, templates=None, offset: float = 1.0):
    """Anchor boxes for each region x template: [..., 4] -> [..., K, 4]."""
    if templates is None:
        templates = adjacency_templates()
    return _apply_normalized(regions, jnp.asarray(templates), offset)


def division_table(div_overlap: float = 0.0) -> np.ndarray:
    """The (5, 4) normalized sub-region table, optionally grown about each
    child's center by ``div_overlap`` (0.0 = exact quadrants + center).
    Shared by the device search AND the NumPy oracle so the two can never
    disagree on geometry."""
    table = _DIVISIONS
    if div_overlap:
        centers = (table[:, :2] + table[:, 2:]) / 2.0
        half = (table[:, 2:] - table[:, :2]) / 2.0 * (1.0 + div_overlap)
        table = np.concatenate([centers - half, centers + half], axis=1).astype(np.float32)
    return table


def divide_regions(regions, div_overlap: float = 0.0, offset: float = 1.0):
    """Zoom subdivision: [..., 4] -> [..., 5, 4] children."""
    return _apply_normalized(regions, jnp.asarray(division_table(div_overlap)), offset)
