"""Off-by-two block structure for the fused (persistent-slot) pipeline.

The round-1 block association (`blocks.py`: block = base_cell // 4, window =
owner + upper corner blocks) leaves ZERO slack on the low side: a particle
drifting one cell in -x escapes its chunk's 8^d window. The reference centers
particles in the window instead — `block_associated_to_point` subtracts an
OFF_BY_TWO before dividing (ref: sparkl `src_kernels/gpu_grid.rs:271-279`,
`src_core/dynamics/particle.rs associated_cell_index_in_block_off_by_two`) so
a sorted particle's base cell sits at window offset 1..4 of the 0..7 window,
giving +-1 cell of drift slack in every direction. That is what lets the
reference's g2p2g scatter particles that moved cells mid-kernel
(`g2p2g.rs:297-309`) — and what lets THIS pipeline re-sort lazily (only when
accumulated drift approaches one cell) instead of every substep.

Geometry: block coordinate bc = floor((c - 2)/4) + 1 where c = round(x/h)
(grid-local); the +1 keeps coordinates non-negative (the reference uses its
PACK_ORIGIN offset for the same purpose). Node storage stays 4-aligned:
block bc covers cells [4(bc-1), 4bc); the 8^d window of (bc .. bc+1)^d
covers [4(bc-1), 4(bc-1) + 8). At sort time base = c - 1 sits at window
offset base - 4(bc-1) in [1..4]; valid transfer offsets are [0..5].

Tail chunks: particles that are active but outside the grid (failed debris)
still need slots — they are packed, unpadded, into chunks after the valid
ones, with chunk_block routed to the trash row so their window reads/writes
hit the zeroed trash block.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.sparse.blocks import (
    BLOCK_SIDE,
    BlockConfig,
    _compact_flagged,
    cells_per_block,
    default_chunk_size,
    region_cells,
    region_side,
)


def block_space_ob2(grid: GridParams):
    """Blocks per axis in the off-by-two space: bc in [0, (res-4)//4 + 1]."""
    return tuple((r - 4) // BLOCK_SIDE + 2 for r in grid.res)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SlotStructure:
    """Fixed-shape sparse structure for slot-resident particle state.

    Same field contract as blocks.BlockStructure where shared (nbr_index /
    chunk_block feed transfer.merge_images_to_grid / gather_grid_windows
    unchanged), plus per-chunk window-origin cells for the fused kernels.
    nbr_index has MAX_BLOCKS + 1 rows: the extra row routes tail/pad chunks
    to the trash grid block in both transfer directions.
    """

    block_keys: jax.Array  # [MAX_BLOCKS] i32 (SENTINEL pad)
    grid_keys: jax.Array  # [MAX_GRID_BLOCKS] i32 owners + corners
    nbr_index: jax.Array  # [MAX_BLOCKS + 1, 2^d] i32 (last row = trash)
    chunk_block: jax.Array  # [MAX_CHUNKS] i32 (MAX_BLOCKS for tail/pad)
    chunk_count: jax.Array  # [MAX_CHUNKS] i32 particles in chunk
    chunk_origin: jax.Array  # [MAX_CHUNKS, d] i32 window origin cell (4bc-2)
    block_first_chunk: jax.Array  # [MAX_BLOCKS] i32 first chunk of block
    block_num_chunks: jax.Array  # [MAX_BLOCKS] i32 chunks per block
    num_blocks: jax.Array  # [] i32 overflow check
    num_grid_blocks: jax.Array  # [] i32
    num_chunks: jax.Array  # [] i32 valid + tail chunks


def particle_block_key_ob2(grid: GridParams, position, valid):
    """Off-by-two linear block key; `ok` = stencil fully inside the grid."""
    origin = jnp.asarray(grid.origin, position.dtype)
    xg = (position - origin) / grid.cell_width
    c = jnp.round(xg).astype(jnp.int32)  # base + 1
    res = jnp.asarray(grid.res, jnp.int32)
    ok = jnp.all((c >= 1) & (c <= res - 2), axis=-1) & valid
    bc = (c - 2) // BLOCK_SIDE + 1
    bspace = block_space_ob2(grid)
    key = bc[..., 0]
    for ax in range(1, len(bspace)):
        key = key * bspace[ax] + bc[..., ax]
    sentinel = jnp.int32(np.prod(bspace))
    return jnp.where(ok, key, sentinel), ok


def _decode_block_coords(block_keys, bspace):
    """Linear ob2 keys -> [*, d] block coordinates (sentinel rows decode to
    out-of-space garbage the callers mask)."""
    dim = len(bspace)
    strides = np.ones(dim, np.int32)
    for ax in range(dim - 2, -1, -1):
        strides[ax] = strides[ax + 1] * bspace[ax + 1]
    coords = []
    rem = block_keys
    for ax in range(dim):
        coords.append(rem // int(strides[ax]))
        rem = rem % int(strides[ax])
    return jnp.stack(coords, axis=-1), strides


def _grid_tables(cfg: BlockConfig, block_keys, bspace, dim):
    """Grid-storage blocks (owners + 2^d upper corners, ref: gpu_grid.rs
    blocks_associated_to_point) + the searchsorted neighbor index, derived
    from sorted block keys. Shared by the full rebuild and the chunk-relabel
    fast path. Returns (coords, grid_keys, num_grid_blocks, nbr_index)."""
    sentinel = jnp.int32(np.prod(bspace))
    corners = np.stack(
        np.meshgrid(*([[0, 1]] * dim), indexing="ij"), axis=-1
    ).reshape(-1, dim)
    coords, strides = _decode_block_coords(block_keys, bspace)
    nbr_coords = coords[:, None, :] + jnp.asarray(corners, jnp.int32)[None, :, :]
    in_space = (
        jnp.all(nbr_coords < jnp.asarray(bspace, jnp.int32), axis=-1)
        & jnp.all(nbr_coords >= 0, axis=-1)
        & (block_keys < sentinel)[:, None]
    )
    nbr_keys = (nbr_coords * jnp.asarray(strides, jnp.int32)[None, None, :]).sum(-1)
    nbr_keys = jnp.where(in_space, nbr_keys, sentinel).reshape(-1)

    cand_sorted = jnp.sort(nbr_keys)
    cand_prev = jnp.concatenate(
        [jnp.full((1,), -1, cand_sorted.dtype), cand_sorted[:-1]]
    )
    cand_flag = (cand_sorted != cand_prev) & (cand_sorted < sentinel)
    grid_keys, num_grid_blocks = _compact_flagged(
        cand_sorted, cand_flag, cfg.max_grid_blocks, sentinel
    )

    found = jnp.searchsorted(grid_keys, nbr_keys, side="left").astype(jnp.int32)
    found = jnp.clip(found, 0, cfg.max_grid_blocks - 1)
    hit = (grid_keys[found] == nbr_keys) & (nbr_keys < sentinel)
    nbr_index = jnp.where(hit, found, cfg.max_grid_blocks).reshape(
        cfg.max_blocks, 2**dim
    )
    # Extra trash row for tail/pad chunks (chunk_block == MAX_BLOCKS).
    nbr_index = jnp.concatenate(
        [nbr_index, jnp.full((1, 2**dim), cfg.max_grid_blocks, jnp.int32)], axis=0
    )
    return coords, grid_keys, num_grid_blocks, nbr_index


def build_slot_structure(
    grid: GridParams, cfg: BlockConfig, position, valid, occupied
):
    """Sort + compact the slot population into blocks / chunks.

    position [N, d]; valid = active & in-grid (owns a block); occupied =
    holds a real particle (valid OR out-of-grid debris -> tail chunks).
    Returns (structure, sort_order [N] i32) where sort_order[i] is the source
    index of sorted position i (valid first, tail second, empty last).
    """
    n, dim = position.shape
    c = cfg.chunk_size
    bspace = block_space_ob2(grid)
    sentinel = jnp.int32(np.prod(bspace))

    key, _ = particle_block_key_ob2(grid, position, valid)
    key = jnp.where(valid, key, jnp.where(occupied, sentinel, sentinel + 1))
    pid = jnp.arange(n, dtype=jnp.int32)
    sorted_key, sort_order = jax.lax.sort_key_val(key, pid)

    prev = jnp.concatenate([jnp.full((1,), -1, sorted_key.dtype), sorted_key[:-1]])
    is_valid = sorted_key < sentinel
    flag = (sorted_key != prev) & is_valid

    block_keys, num_blocks = _compact_flagged(
        sorted_key, flag, cfg.max_blocks, sentinel
    )
    pos_idx = jnp.arange(n, dtype=jnp.int32)
    block_start, _ = _compact_flagged(pos_idx, flag, cfg.max_blocks, n)
    num_valid = jnp.sum(is_valid.astype(jnp.int32))
    num_occupied = jnp.sum((sorted_key <= sentinel).astype(jnp.int32))
    next_start = jnp.concatenate([block_start[1:], jnp.full((1,), n, jnp.int32)])
    next_start = jnp.minimum(next_start, num_valid)
    block_count = jnp.maximum(next_start - jnp.minimum(block_start, num_valid), 0)

    coords, grid_keys, num_grid_blocks, nbr_index = _grid_tables(
        cfg, block_keys, bspace, dim
    )

    # Valid chunks (<= C particles of one block) followed by tail chunks.
    nchunks_per_block = -(-block_count // c)
    chunk_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nchunks_per_block)[:-1]]
    )
    num_valid_chunks = jnp.sum(nchunks_per_block)
    n_tail = num_occupied - num_valid
    n_tail_chunks = -(-n_tail // c)
    num_chunks = num_valid_chunks + n_tail_chunks

    cid = jnp.arange(cfg.max_chunks, dtype=jnp.int32)
    blk_of_chunk = (
        jnp.searchsorted(chunk_base, cid, side="right").astype(jnp.int32) - 1
    )
    blk_of_chunk = jnp.clip(blk_of_chunk, 0, cfg.max_blocks - 1)
    local_chunk = cid - chunk_base[blk_of_chunk]
    is_valid_chunk = cid < num_valid_chunks
    is_tail_chunk = (~is_valid_chunk) & (cid < num_chunks)

    v_start = block_start[blk_of_chunk] + local_chunk * c
    v_count = jnp.clip(block_count[blk_of_chunk] - local_chunk * c, 0, c)
    t_local = cid - num_valid_chunks
    t_start = num_valid + t_local * c
    t_count = jnp.clip(n_tail - t_local * c, 0, c)

    chunk_start = jnp.where(is_valid_chunk, v_start, jnp.where(is_tail_chunk, t_start, 0))
    chunk_count = jnp.where(is_valid_chunk, v_count, jnp.where(is_tail_chunk, t_count, 0))
    chunk_block = jnp.where(is_valid_chunk, blk_of_chunk, cfg.max_blocks)

    # Window origin cells: 4*(bc - 1) per axis — block bc's particles have
    # base cells in [4bc-3, 4bc], i.e. window offsets 1..4 of the 8-cell
    # window starting at 4(bc-1). (Tail/pad chunks: origin 0; their transfers
    # are masked and routed to the trash row.)
    blk_coords = coords[jnp.clip(chunk_block, 0, cfg.max_blocks - 1)]
    chunk_origin = jnp.where(
        is_valid_chunk[:, None], (blk_coords - 1) * BLOCK_SIDE, 0
    ).astype(jnp.int32)

    structure = SlotStructure(
        block_keys=block_keys,
        grid_keys=grid_keys,
        nbr_index=nbr_index,
        chunk_block=chunk_block,
        chunk_count=chunk_count,
        chunk_origin=chunk_origin,
        block_first_chunk=chunk_base,
        block_num_chunks=nchunks_per_block,
        num_blocks=num_blocks,
        num_grid_blocks=num_grid_blocks,
        num_chunks=num_chunks,
    )
    return structure, sort_order, chunk_start


def slot_key_rows(grid: GridParams, cfg: BlockConfig, position, valid, occupied):
    """Effective sort keys of a slot population, in slot layout [D, C]
    (exactly the keys build_slot_structure would sort: linear ob2 block key
    for valid slots, sentinel for occupied-but-out-of-grid tails,
    sentinel + 1 for empty lanes)."""
    bspace = block_space_ob2(grid)
    sentinel = jnp.int32(np.prod(bspace))
    key, _ = particle_block_key_ob2(grid, position, valid)
    key = jnp.where(valid, key, jnp.where(occupied, sentinel, sentinel + 1))
    return key.reshape(cfg.max_chunks, cfg.chunk_size)


def detect_chunk_relabel(grid: GridParams, cfg: BlockConfig, key_eff, occupied):
    """Can this resort skip the global slot sort entirely?

    True when the stable sort of the new keys would reproduce the CURRENT
    slot order verbatim — then no particle moves and the whole resort is a
    pure relabeling of chunks to (shifted) blocks, with the structure
    derivable from the D per-chunk keys alone (structure_from_chunk_keys).
    The conditions (each necessary for order preservation, jointly
    sufficient):

      1. every chunk is homogeneous: all occupied lanes share one key, and
         lane 0 is occupied whenever any lane is (no split chunks);
      2. occupied lanes form a prefix (the chunk_count contract);
      3. chunk keys are non-decreasing across the chunk sequence (empty
         chunks count as sentinel + 1, so valid < tail < empty order holds);
      4. adjacent chunks with EQUAL non-empty keys require the left chunk
         full — a partial chunk mid-block would be repacked by the rebuild.

    This is the common coherent-motion resort (uniform fall shifts every key
    by the same block offset); incoherent resorts fall back to the sorted
    rebuild. Returns (ok [] bool, chunk_key [D] i32, occ_count [D] i32)."""
    c = cfg.chunk_size
    bspace = block_space_ob2(grid)
    sentinel = jnp.int32(np.prod(bspace))

    occ_any = jnp.any(occupied, axis=1)
    occ_count = jnp.sum(occupied.astype(jnp.int32), axis=1)
    lane0 = key_eff[:, 0]
    homog = jnp.all(
        jnp.where(occupied, key_eff == lane0[:, None], True), axis=1
    ) & (occupied[:, 0] | ~occ_any)
    occ_i = occupied.astype(jnp.int32)
    prefix = jnp.all(occ_i[:, :-1] >= occ_i[:, 1:], axis=1)
    ckey = jnp.where(occ_any, lane0, sentinel + 1)
    mono = jnp.all(ckey[:-1] <= ckey[1:])
    full_rule = jnp.all(
        (ckey[:-1] != ckey[1:]) | (ckey[:-1] > sentinel) | (occ_count[:-1] == c)
    )
    ok = jnp.all(homog & prefix) & mono & full_rule
    return ok, ckey, occ_count


def structure_from_chunk_keys(grid: GridParams, cfg: BlockConfig, ckey, occ_count):
    """SlotStructure for a kept slot layout, from per-chunk keys alone.

    Valid ONLY when detect_chunk_relabel passed: chunks keep their particles
    and their order, so blocks are the runs of equal chunk keys — no global
    sort, no per-slot work. Field-for-field identical to what
    build_slot_structure would produce for the same population (the sorted
    rebuild of an already-sorted population is the identity)."""
    dim = grid.dim
    d_ = cfg.max_chunks
    bspace = block_space_ob2(grid)
    sentinel = jnp.int32(np.prod(bspace))

    is_valid_chunk = ckey < sentinel
    is_tail_chunk = ckey == sentinel
    num_chunks = jnp.sum((is_valid_chunk | is_tail_chunk).astype(jnp.int32))
    num_valid_chunks = jnp.sum(is_valid_chunk.astype(jnp.int32))

    prev = jnp.concatenate([jnp.full((1,), -1, ckey.dtype), ckey[:-1]])
    newblk = (ckey != prev) & is_valid_chunk
    block_keys, num_blocks = _compact_flagged(
        ckey, newblk, cfg.max_blocks, sentinel
    )
    cid = jnp.arange(d_, dtype=jnp.int32)
    block_first_chunk, _ = _compact_flagged(
        cid, newblk, cfg.max_blocks, num_valid_chunks
    )
    nxt = jnp.concatenate(
        [block_first_chunk[1:], num_valid_chunks[None].astype(jnp.int32)]
    )
    block_num_chunks = jnp.maximum(nxt - block_first_chunk, 0)

    runidx = jnp.cumsum(newblk.astype(jnp.int32)) - 1
    chunk_block = jnp.where(
        is_valid_chunk, jnp.clip(runidx, 0, cfg.max_blocks - 1), cfg.max_blocks
    )

    coords, grid_keys, num_grid_blocks, nbr_index = _grid_tables(
        cfg, block_keys, bspace, dim
    )

    ck_coords, _ = _decode_block_coords(ckey, bspace)
    chunk_origin = jnp.where(
        is_valid_chunk[:, None], (ck_coords - 1) * BLOCK_SIDE, 0
    ).astype(jnp.int32)

    return SlotStructure(
        block_keys=block_keys,
        grid_keys=grid_keys,
        nbr_index=nbr_index,
        chunk_block=chunk_block,
        chunk_count=occ_count,
        chunk_origin=chunk_origin,
        block_first_chunk=block_first_chunk,
        block_num_chunks=block_num_chunks,
        num_blocks=num_blocks,
        num_grid_blocks=num_grid_blocks,
        num_chunks=num_chunks,
    )


def slot_source_index(cfg: BlockConfig, sort_order, chunk_start, chunk_count):
    """[D*C] source index (into the pre-sort population) per slot + validity.

    Slot (chunk j, lane l) holds sorted position chunk_start[j] + l when
    l < chunk_count[j]; empty slots read source 0 and are masked.
    """
    c = cfg.chunk_size
    lanes = jnp.arange(c, dtype=jnp.int32)[None, :]
    src_sorted = chunk_start[:, None] + lanes
    valid = lanes < chunk_count[:, None]
    src_sorted = jnp.where(valid, src_sorted, 0)
    src = sort_order[src_sorted.reshape(-1)]
    return src, valid.reshape(-1)


def block_node_positions_ob2(grid: GridParams, grid_keys):
    """World positions of every node of every ob2 block: [MGB, 4^d, d].

    Block bc's node storage covers the 4-aligned cells [4(bc-1), 4bc) per
    axis — the off-by-two shifts only the particle->block association, not
    the storage alignment (ref: gpu_grid.rs block storage is block-aligned).
    """
    dim = grid.dim
    bspace = block_space_ob2(grid)
    strides = np.ones(dim, np.int64)
    for ax in range(dim - 2, -1, -1):
        strides[ax] = strides[ax + 1] * bspace[ax + 1]
    rem = grid_keys.astype(jnp.int64)
    coords = []
    for ax in range(dim):
        coords.append(rem // int(strides[ax]))
        rem = rem % int(strides[ax])
    bc = jnp.stack(coords, axis=-1).astype(jnp.float32)

    side = BLOCK_SIDE
    rng = np.arange(side)
    local = np.stack(np.meshgrid(*([rng] * dim), indexing="ij"), axis=-1).reshape(
        -1, dim
    )
    origin = jnp.asarray(grid.origin, jnp.float32)
    return (
        origin
        + ((bc[:, None, :] - 1.0) * side + jnp.asarray(local, jnp.float32)[None, :, :])
        * grid.cell_width
    )


def calibrate_ob2(grid: GridParams, position, active, slack=1.5):
    """Size BlockConfig capacities from the actual distribution, in ob2 space
    (host-side numpy, once at setup). Mirrors blocks.BlockConfig.calibrate
    but with the off-by-two association, plus tail-chunk headroom."""
    pos = np.asarray(position)
    act = np.asarray(active)
    dim = pos.shape[1]
    c = default_chunk_size(dim)
    n = pos.shape[0]

    origin = np.asarray(grid.origin, np.float64)
    cc = np.round((pos - origin) / grid.cell_width).astype(np.int64)
    res = np.asarray(grid.res)
    ok = act & np.all((cc >= 1) & (cc <= res - 2), axis=-1)
    bc = (cc[ok] - 2) // BLOCK_SIDE + 1
    bspace = block_space_ob2(grid)
    key = bc[:, 0]
    for ax in range(1, dim):
        key = key * bspace[ax] + bc[:, ax]
    uniq, counts = np.unique(key, return_counts=True)
    n_blocks = max(len(uniq), 1)
    n_chunks = int(np.sum(-(-counts // c))) if len(counts) else 1
    coords = np.stack(np.unravel_index(uniq, bspace), axis=-1) if len(uniq) else np.zeros((0, dim), np.int64)
    corners = np.stack(
        np.meshgrid(*([[0, 1]] * dim), indexing="ij"), axis=-1
    ).reshape(-1, dim)
    cand = (coords[:, None, :] + corners[None, :, :]).reshape(-1, dim)
    in_space = np.all(cand < np.asarray(bspace), axis=-1)
    cand_keys = cand[:, 0].astype(np.int64)
    for ax in range(1, dim):
        cand_keys = cand_keys * bspace[ax] + cand[:, ax]
    n_grid = max(len(np.unique(cand_keys[in_space])), 1)

    # Tail headroom: debris particles leaving the grid later.
    tail = -(-max(int(0.02 * n), 64) // c) + 2

    def q(x, step):
        return int(-(-int(x) // step) * step)

    return BlockConfig(
        max_blocks=q(n_blocks * slack + 16, 256),
        max_chunks=q(n_chunks * slack + tail + 16, 512),
        chunk_size=c,
        max_grid_blocks=q(n_grid * slack + 16, 256),
    )
