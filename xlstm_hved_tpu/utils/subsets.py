"""Modality-subset machinery.

The reference enumerates the 15 non-empty subsets of the 4 MRI modalities
(t1c, t1n, t2f, t2w) with itertools combinations ordered by subset size
(/root/reference/RA_HVED.py:733-738, /root/reference/utils.py:28-34). Under
jit we represent subsets as a static (15, 4) boolean table and always select
by mask, never by data-dependent list indexing.

The reference's training-time subset sampler (/root/reference/utils.py:36-51)
has an off-by-one: the size-3 bucket is range(10, 13) so subset 13 = (1,2,3)
is never sampled and the "size-4" bucket returns index 13 (a triple). We fix
both: buckets are size-1 [0,4), size-2 [4,10), size-3 [10,14), size-4 {14}.
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

NUM_MODALITIES = 4
MODALITIES = tuple(range(NUM_MODALITIES))
MODALITY_NAMES = ("t1c", "t1n", "t2f", "t2w")

# Ordered by size then lexicographic, matching the reference enumeration:
# (0,),(1,),(2,),(3,),(0,1),(0,2),(0,3),(1,2),(1,3),(2,3),
# (0,1,2),(0,1,3),(0,2,3),(1,2,3),(0,1,2,3)
SUBSETS_MODALITIES = tuple(
    itertools.chain.from_iterable(
        itertools.combinations(MODALITIES, r) for r in range(1, NUM_MODALITIES + 1)
    )
)
NUM_SUBSETS = len(SUBSETS_MODALITIES)  # 15
FULL_SUBSET_INDEX = NUM_SUBSETS - 1  # 14

# (15, 4) bool: SUBSET_MASKS[s, m] == True iff modality m is present in subset s.
SUBSET_MASKS = np.zeros((NUM_SUBSETS, NUM_MODALITIES), dtype=bool)
for _s, _subset in enumerate(SUBSETS_MODALITIES):
    SUBSET_MASKS[_s, list(_subset)] = True
SUBSET_MASKS.setflags(write=False)

# Inclusive index ranges of each subset-size bucket (size -> (start, end)).
SIZE_BUCKETS = {1: (0, 4), 2: (4, 10), 3: (10, 14), 4: (14, 15)}


def subset_mask(subset_index) -> jnp.ndarray:
    """(4,) bool keep-mask for a (possibly traced) subset index."""
    table = jnp.asarray(SUBSET_MASKS)
    return table[subset_index]


def drop_mask(subset_index) -> jnp.ndarray:
    """(4,) bool drop-mask (True = modality missing), as used by the
    reference's batch-missing path (/root/reference/RA_HVED.py:517-520)."""
    return ~subset_mask(subset_index)


def sample_subset_index(key: jax.Array, min_size: int = 1, max_size: int = 3) -> jax.Array:
    """Sample one subset index the way the reference training loop does
    (/root/reference/train.py:222-223): first draw a size uniformly from
    [min_size, max_size], then a subset uniformly within that size bucket.

    Jit-friendly (pure jnp). Fixes the reference's bucket off-by-one.
    """
    ksize, kidx = jax.random.split(key)
    size = jax.random.randint(ksize, (), min_size, max_size + 1)
    starts = jnp.asarray([SIZE_BUCKETS[s][0] for s in range(1, 5)])
    ends = jnp.asarray([SIZE_BUCKETS[s][1] for s in range(1, 5)])
    lo = starts[size - 1]
    hi = ends[size - 1]
    u = jax.random.uniform(kidx, ())
    return (lo + jnp.floor(u * (hi - lo)).astype(jnp.int32)).astype(jnp.int32)


def sample_instance_drop(key: jax.Array, batch: int) -> jnp.ndarray:
    """Per-instance modality drop mask (B, 4) with at least one modality kept,
    mirroring GBMset's random dropout (/root/reference/BraTSdataset.py:387-405).
    True = dropped.
    """
    kdrop, kkeep = jax.random.split(key)
    drop = jax.random.bernoulli(kdrop, 0.5, (batch, NUM_MODALITIES))
    # If all four dropped, force one random modality back on.
    all_dropped = jnp.all(drop, axis=1, keepdims=True)
    forced = jax.nn.one_hot(
        jax.random.randint(kkeep, (batch,), 0, NUM_MODALITIES), NUM_MODALITIES, dtype=bool
    )
    return jnp.where(all_dropped & forced, False, drop)
