"""Minimal NanoVDB (.nvdb) reader for float grids.

Replaces the reference's vendored nanovdb header usage
(testbed_volume.cu:609-701 load_volume): we only need the dense
density values + index bounding box, so rather than navigating the full
NanoVDB tree structure on device, we decode the tree on the host into a
dense numpy grid (the reference similarly walks leaf nodes into its own
bitgrid).

Format notes (NanoVDB 32.x file layout):
  * FileHeader: magic 0x304244566f6e614eull ("NanoVDB0"), version,
    grid count, codec
  * per-grid FileMetaData + grid name
  * GridData blob (4KB-aligned structures); we parse GridData →
    TreeData → root/internal/leaf tables for FLOAT grids.

Given the variability across NanoVDB versions, this parser targets the
layout used by the wdas_cloud sample files (nanovdb 32.3, float grid,
no compression). A procedural-fog fallback is provided for tests.
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path

import numpy as np

MAGIC = 0x304244566F6E614E  # "NanoVDB0"
MAGIC_GRID = 0x314244566F6E614E


def read_nvdb_dense(path):
    """Read a .nvdb float grid → (dense (X,Y,Z) float32, index_min)."""
    raw = Path(path).read_bytes()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    (magic,) = struct.unpack_from("<Q", raw, 0)
    if magic not in (MAGIC, MAGIC_GRID):
        raise ValueError(f"not a NanoVDB file (magic {magic:#x})")

    if magic == MAGIC:
        # FileHeader: magic(8) version(4) gridCount(2) codec(2)
        version, grid_count, codec = struct.unpack_from("<IHH", raw, 8)
        if codec != 0:
            raise NotImplementedError(f"nvdb codec {codec} (compressed) unsupported")
        # FileMetaData (v32.3: 176 bytes) followed by name
        meta_off = 16
        (
            grid_size, file_size, name_key, voxel_count, grid_type, grid_class,
        ) = struct.unpack_from("<QQQQII", raw, meta_off)
        # world/index bboxes + voxel size etc follow; name length at +160
        name_len, = struct.unpack_from("<I", raw, meta_off + 168)
        grid_off = meta_off + 176 + name_len
    else:
        grid_off = 0

    return _parse_grid_data(raw, grid_off)


def _parse_grid_data(raw: bytes, off: int):
    # GridData (v32.x): magic(8) checksum(8) version(4) flags(4)
    # gridIndex(4) gridCount(4) gridSize(8) gridName(256) map(264)
    # worldBBox(48) voxelSize(24) gridClass(4) gridType(4) blindoff(8)
    # blindcount(4) data0(4) data1(8) data2(8)
    magic, _chk, _ver, _flags, _gi, _gc, grid_size = struct.unpack_from("<QQIIIIQ", raw, off)
    grid_type_off = off + 8 + 8 + 4 + 4 + 4 + 4 + 8 + 256 + 264 + 48 + 24 + 4
    (grid_type,) = struct.unpack_from("<I", raw, grid_type_off - 4)
    # TreeData immediately follows GridData (GridData is 672 bytes in v32.3)
    tree_off = off + 672
    # TreeData: nodeOffset[4] (u64 x4), nodeCount[3] (u32 x3), tileCount[3](u32x3), voxelCount(u64)
    node_off = struct.unpack_from("<4Q", raw, tree_off)
    node_count = struct.unpack_from("<3I", raw, tree_off + 32)
    root_off = tree_off + node_off[3]

    # RootData<float>: bbox (2x int32x3), tableSize(u32), background(f),
    # min,max,avg,stddev (f each)
    bbox = struct.unpack_from("<6i", raw, root_off)
    (table_size,) = struct.unpack_from("<I", raw, root_off + 24)
    background = struct.unpack_from("<f", raw, root_off + 28)[0]

    imin = np.array(bbox[:3])
    imax = np.array(bbox[3:]) + 1
    shape = imax - imin
    dense = np.full(shape, background, np.float32)

    # Root tiles: aligned to 32 bytes after RootData header (44 bytes → pad to 32? v32: RootData size = 64)
    root_data_size = 64
    tile_size = 32  # Tile<float>: key(u64) child(i64) state(u32) value(f) pad
    leaf_size_log2 = 3  # 8^3 leaves

    # Walk: root tiles → upper internal (32^3) → lower internal (16^3) → leaves (8^3)
    # InternalData sizes (float, v32.3):
    #   upper: bbox(24) flags(8) valueMask(4096) childMask(4096) min/max/avg/std(16) pad → table 32768*8
    #   lower: bbox(24) flags(8) valueMask(512) childMask(512) min/max/avg/std(16) pad → table 4096*8
    def read_internal(ioff, log2dim):
        n = 1 << (3 * log2dim)
        mask_words = n // 64
        bbox_l = struct.unpack_from("<6i", raw, ioff)
        flags_off = ioff + 24
        vmask_off = flags_off + 8
        cmask_off = vmask_off + mask_words * 8
        stats_off = cmask_off + mask_words * 8
        table_off = ioff + _align32(stats_off + 16 - ioff)
        vmask = np.frombuffer(raw, np.uint64, mask_words, vmask_off)
        cmask = np.frombuffer(raw, np.uint64, mask_words, cmask_off)
        return bbox_l, vmask, cmask, table_off, n

    def _align32(x):
        return (x + 31) & ~31

    def mask_bits(mask_words_arr, n):
        bits = np.unpackbits(
            mask_words_arr.view(np.uint8), bitorder="little"
        )[:n]
        return bits.astype(bool)

    LEAF_DATA_SIZE = None

    def read_leaf_values(loff):
        # LeafData<float>: bbox min (3x i32) + bbox dif (3x u8) + flags(u8)
        # ... valueMask(64 bytes) min,max,avg,std (16) values[512]
        # v32.3 layout: CoordBBox compressed: mBBoxMin(12) mBBoxDif(3) mFlags(1)
        vmask_off = loff + 16
        vals_off = loff + 16 + 64 + 16
        vals = np.frombuffer(raw, np.float32, 512, vals_off)
        origin = struct.unpack_from("<3i", raw, loff)
        return origin, vals

    # Iterate root tiles
    for t in range(table_size):
        toff = root_off + root_data_size + t * tile_size
        key, child = struct.unpack_from("<Qq", raw, toff)
        if child <= 0:
            continue
        upper_off = root_off + child
        # decode tile key → origin (packed 21-bit per axis)
        ox = _key_to_coord(key)
        bbox_u, vmask_u, cmask_u, table_u, n_u = read_internal(upper_off, 5)
        cbits = mask_bits(cmask_u, n_u)
        table = np.frombuffer(raw, np.int64, n_u, table_u)
        for iu in np.nonzero(cbits)[0]:
            lower_off = upper_off + table[iu]
            bbox_l, vmask_l, cmask_l, table_l, n_l = read_internal(lower_off, 4)
            lbits = mask_bits(cmask_l, n_l)
            ltable = np.frombuffer(raw, np.int64, n_l, table_l)
            for il in np.nonzero(lbits)[0]:
                leaf_off = lower_off + ltable[il]
                origin, vals = read_leaf_values(leaf_off)
                x0, y0, z0 = (np.array(origin) - imin)
                if (
                    0 <= x0 <= shape[0] - 8
                    and 0 <= y0 <= shape[1] - 8
                    and 0 <= z0 <= shape[2] - 8
                ):
                    dense[x0 : x0 + 8, y0 : y0 + 8, z0 : z0 + 8] = vals.reshape(8, 8, 8)
    return dense, imin


def _key_to_coord(key: int):
    kz = key & ((1 << 21) - 1)
    ky = (key >> 21) & ((1 << 21) - 1)
    kx = (key >> 42) & ((1 << 21) - 1)
    return kx, ky, kz


def procedural_fog_volume(res: int = 128) -> np.ndarray:
    """Procedural cloud-like density for tests / when no .nvdb exists."""
    rng = np.random.default_rng(7)
    coords = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
    r = np.sqrt(x**2 + 1.5 * y**2 + z**2)
    base = np.clip(0.7 - r, 0, None)
    noise = np.zeros((res, res, res), np.float32)
    for octave in range(1, 4):
        n = min(2**octave * 4, res)
        small = rng.random((n, n, n)).astype(np.float32)
        reps = res // n
        up = np.kron(small, np.ones((reps, reps, reps), np.float32))
        noise += up / 2**octave
    dens = np.clip(base * (0.5 + noise), 0, None) * 4.0
    return dens.astype(np.float32)
