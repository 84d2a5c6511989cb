"""Pure-Python HDF5 decode tier for the archival source (SURVEY §2.1 S1).

``h5py`` is absent from this environment, so the S1 decode was a gated
fake. This module closes the gap the same way the multimodal sources
did for PNG/JPEG/MP4: a hand-rolled decoder for a BOUNDED, documented
subset of the container format, written from the public HDF5 File
Format Specification (v1.10, "Disk Format: Level 0-2"):

- superblock versions 0 and 1 (the classic formats; v1 adds the
  indexed-storage B-tree K field — r11),
- superblock versions 2/3 (``libver='latest'``; r10 — VERDICT r9
  item 7), verified against their Jenkins lookup3 checksums,
- version-1 object headers (no checksums) AND version-2 ``OHDR``
  headers (checksummed, with OCHK continuation blocks; r10),
- symbol-table groups (B-tree v1 + local heap + SNOD leaf nodes),
  compact link-message groups (the v2-header group layout; r10), AND
  dense link storage — fractal heap with a direct-block root + type-5
  version-2 B-tree name index, the layout libhdf5 switches to past
  max_compact=8 links (r12 — VERDICT r11 item 8),
- contiguous or compact data layout (message v3),
- CHUNKED data layout (message v3 class 2) indexed by a version-1
  B-tree, with deflate (gzip) and byte-shuffle filter pipelines —
  libhdf5's default compressed shape, ``h5py.create_dataset(...,
  compression='gzip', shuffle=True)`` (r11 — VERDICT r10 item 6),
- little-endian IEEE float32/64 and signed int16/32/64 datasets.

That subset covers what h5py produces for small-to-medium archives of
plain numeric datasets under the default, ``libver='latest'``, AND
gzip-compressed settings — the reference's per-operation vibration
files (``M01_Aug_2019_OP00_000.h5``; three 1-D float arrays) fall
squarely inside it. Still routed to the import-gated h5py path in
``sources/hdf5.py``: exotic filters (szip/lzf/fletcher32), non-native
datatypes, and the far dense tail (indirect-rooted / filtered fractal
heaps, depth>0 v2 B-trees — groups past ~180 links).
tests/test_hdf5.py::test_format_matrix names both sets explicitly.

The writers emit the same layouts (single root group, flat datasets)
— they exist to build test fixtures and golden files without h5py,
and every structure they write follows the spec byte-for-byte
(including the lookup3 checksums, validated against the public
lookup3.c test vectors) so a real libhdf5 can open the files wherever
one exists.
"""

from __future__ import annotations

import struct

import numpy as np

SIGNATURE = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF

# header message type ids (spec IV.A.2)
MSG_NIL = 0x0000
MSG_DATASPACE = 0x0001
MSG_LINK_INFO = 0x0002
MSG_DATATYPE = 0x0003
MSG_FILL_OLD = 0x0004
MSG_FILL = 0x0005
MSG_LINK = 0x0006
MSG_LAYOUT = 0x0008
MSG_GROUP_INFO = 0x000A
MSG_CONTINUATION = 0x0010
MSG_SYMBOL_TABLE = 0x0011
MSG_FILTER = 0x000B

# filter ids (spec IV.A.2.l; public registered filters)
FILTER_DEFLATE = 1
FILTER_SHUFFLE = 2

_BTREE_K = 4  # group leaf node k -> SNOD capacity 2k entries


class Hdf5FormatError(ValueError):
    """Raised when the payload is not HDF5 or uses a layout outside the
    documented native subset (the caller then falls back to h5py or a
    NULL row, never a crash inside the executor)."""


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


def _u(buf: bytes, off: int, n: int) -> int:
    return int.from_bytes(buf[off : off + n], "little")


_M32 = 0xFFFFFFFF


def _rot32(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & _M32


def lookup3(data: bytes, initval: int = 0) -> int:
    """Bob Jenkins' public-domain lookup3 ``hashlittle`` (the checksum
    libhdf5 uses for superblock v2/v3 and OHDR/OCHK blocks; HDF5 spec
    appendix + lookup3.c). Validated in tests against the test vectors
    published in lookup3.c's own driver ("Four score and seven years
    ago" -> 0x17770551 / 0xcd628161)."""
    a = b = c = (0xDEADBEEF + len(data) + initval) & _M32
    i, remaining = 0, len(data)
    while remaining > 12:
        a = (a + _u(data, i, 4)) & _M32
        b = (b + _u(data, i + 4, 4)) & _M32
        c = (c + _u(data, i + 8, 4)) & _M32
        # mix(a, b, c)
        a = (a - c) & _M32; a ^= _rot32(c, 4); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rot32(a, 6); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rot32(b, 8); b = (b + a) & _M32
        a = (a - c) & _M32; a ^= _rot32(c, 16); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rot32(a, 19); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rot32(b, 4); b = (b + a) & _M32
        i += 12
        remaining -= 12
    if remaining == 0:
        return c
    tail = data[i:] + b"\x00" * (12 - remaining)
    a = (a + _u(tail, 0, 4)) & _M32
    b = (b + _u(tail, 4, 4)) & _M32
    c = (c + _u(tail, 8, 4)) & _M32
    # final(a, b, c)
    c ^= b; c = (c - _rot32(b, 14)) & _M32
    a ^= c; a = (a - _rot32(c, 11)) & _M32
    b ^= a; b = (b - _rot32(a, 25)) & _M32
    c ^= b; c = (c - _rot32(b, 16)) & _M32
    a ^= c; a = (a - _rot32(c, 4)) & _M32
    b ^= a; b = (b - _rot32(a, 14)) & _M32
    c ^= b; c = (c - _rot32(b, 24)) & _M32
    return c


def _parse_object_header_v1(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    """All (type, body) messages of a v1 object header, following
    continuation blocks. v1 prefix: version, reserved, n_msgs(2),
    refcount(4), header_size(4), then 4 pad bytes to 8-align the
    message block."""
    if buf[addr] != 1:
        raise Hdf5FormatError(
            f"object header version {buf[addr]} at {addr:#x}: neither the "
            "classic v1 prefix nor an OHDR v2 signature"
        )
    n_msgs = _u(buf, addr + 2, 2)
    block_size = _u(buf, addr + 8, 4)
    blocks = [(addr + 16, block_size)]
    msgs: list[tuple[int, bytes]] = []
    bi = 0
    pos, remaining = blocks[0][0], blocks[0][1]
    while len(msgs) < n_msgs:
        if remaining < 8:
            bi += 1
            if bi >= len(blocks):
                raise Hdf5FormatError("object header truncated (message count)")
            pos, remaining = blocks[bi]
        mtype = _u(buf, pos, 2)
        msize = _u(buf, pos + 2, 2)
        body = buf[pos + 8 : pos + 8 + msize]
        pos += 8 + msize
        remaining -= 8 + msize
        if mtype == MSG_CONTINUATION:
            blocks.append((_u(body, 0, 8), _u(body, 8, 8)))
        msgs.append((mtype, body))
    return msgs


def _parse_object_header_v2(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    """All (type, body) messages of a version-2 ``OHDR`` object header
    (HDF5 spec IV.A.1.b), following ``OCHK`` continuation blocks. Every
    block's trailing lookup3 checksum is verified — a v2 header is
    checksummed end-to-end, unlike v1."""
    if buf[addr : addr + 4] != b"OHDR":
        raise Hdf5FormatError(f"OHDR signature missing at {addr:#x}")
    if buf[addr + 4] != 2:
        raise Hdf5FormatError(f"OHDR version {buf[addr + 4]}")
    flags = buf[addr + 5]
    pos = addr + 6
    if flags & 0x20:  # times stored
        pos += 16
    if flags & 0x10:  # storage phase-change values stored
        pos += 4
    len_size = 1 << (flags & 0x03)
    chunk0 = _u(buf, pos, len_size)
    pos += len_size
    # message header: type(1) size(2) flags(1) [+creation order(2)]
    hdr = 6 if flags & 0x04 else 4
    blocks = [(addr, pos, chunk0)]  # (block start, msgs start, msgs len)
    # lake payloads are untrusted input: a crafted/corrupt continuation
    # chain that revisits a block (or never terminates) must fail loud,
    # not loop — track visited starts and cap the chain length
    seen_blocks = {addr}
    msgs: list[tuple[int, bytes]] = []
    bi = 0
    while bi < len(blocks):
        start, pos, length = blocks[bi]
        expect = lookup3(buf[start : pos + length])
        stored = _u(buf, pos + length, 4)
        if expect != stored:
            raise Hdf5FormatError(
                f"OHDR/OCHK checksum mismatch at {start:#x}: "
                f"{stored:#010x} != {expect:#010x}"
            )
        end = pos + length
        while end - pos >= hdr:
            mtype = buf[pos]
            msize = _u(buf, pos + 1, 2)
            if pos + hdr + msize > end:
                break  # trailing gap (smaller than a full message)
            body = buf[pos + hdr : pos + hdr + msize]
            pos += hdr + msize
            if mtype == MSG_CONTINUATION:
                caddr, clen = _u(body, 0, 8), _u(body, 8, 8)
                if caddr in seen_blocks:
                    raise Hdf5FormatError(
                        f"OCHK continuation cycle: block {caddr:#x} revisited"
                    )
                if len(blocks) >= 64:
                    raise Hdf5FormatError("OCHK continuation chain exceeds 64 blocks")
                if buf[caddr : caddr + 4] != b"OCHK":
                    raise Hdf5FormatError("OCHK signature missing")
                seen_blocks.add(caddr)
                # clen covers sig + messages + checksum
                blocks.append((caddr, caddr + 4, clen - 8))
            msgs.append((mtype, body))
        bi += 1
    return msgs


def _parse_object_header(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    if buf[addr : addr + 4] == b"OHDR":
        return _parse_object_header_v2(buf, addr)
    return _parse_object_header_v1(buf, addr)


def _parse_link(body: bytes) -> tuple[str, int]:
    """(name, object header address) from a hard Link message (type
    0x06, spec IV.A.2.g — the compact link storage a v2-header group
    uses instead of the classic symbol table)."""
    if body[0] != 1:
        raise Hdf5FormatError(f"link message version {body[0]}")
    flags = body[1]
    pos = 2
    ltype = 0
    if flags & 0x08:
        ltype = body[pos]
        pos += 1
    if flags & 0x04:  # creation order
        pos += 8
    if flags & 0x10:  # charset
        pos += 1
    name_len_size = 1 << (flags & 0x03)
    name_len = _u(body, pos, name_len_size)
    pos += name_len_size
    name = body[pos : pos + name_len].decode("utf-8")
    pos += name_len
    if ltype != 0:
        raise Hdf5FormatError(
            f"link '{name}' is type {ltype}: native tier follows hard links only"
        )
    return name, _u(body, pos, 8)


def _collect_links(buf: bytes, msgs: list[tuple[int, bytes]]) -> list[tuple[str, int]]:
    """Group members from any of the three group layouts: the classic
    symbol-table message (v0 files), compact Link messages (v2-header
    files, <= 8 links), or DENSE storage (r12 — fractal heap + v2
    B-tree name index, the layout libhdf5 switches to past
    max_compact=8 links)."""
    st = next((b for t, b in msgs if t == MSG_SYMBOL_TABLE), None)
    if st is not None:
        return _group_links(buf, _u(st, 0, 8), _u(st, 8, 8))
    for t, b in msgs:
        if t == MSG_LINK_INFO:
            pos = 2 + (8 if b[1] & 0x01 else 0)  # version, flags, [max order]
            fheap = _u(b, pos, 8)
            if fheap != UNDEF:
                return _dense_links(buf, fheap, _u(b, pos + 8, 8))
    links = [_parse_link(b) for t, b in msgs if t == MSG_LINK]
    if not links and not any(t == MSG_LINK_INFO for t, _ in msgs):
        raise Hdf5FormatError(
            "group has neither a symbol table nor link messages"
        )
    return links


def _fractal_heap_reader(buf: bytes, addr: int):
    """Managed-object reader for a fractal heap (spec III.E/III.F/III.G)
    rooted at a DIRECT block — the shape libhdf5 uses for dense-link
    groups until managed space outgrows the starting block size. Returns
    ``read(heap_id_bytes) -> object bytes``. Indirect-rooted heaps,
    filtered heaps, and huge/tiny heap ids gate to h5py with a typed
    error (far past any realistic link count for archive files)."""
    if buf[addr : addr + 4] != b"FRHP":
        raise Hdf5FormatError("fractal heap signature missing")
    if buf[addr + 4] != 0:
        raise Hdf5FormatError(f"fractal heap version {buf[addr + 4]}")
    if _u(buf, addr + 7, 2):  # I/O filters' encoded length
        raise Hdf5FormatError("filtered fractal heap: needs h5py")
    flags = buf[addr + 9]
    max_managed = _u(buf, addr + 10, 4)
    max_heap_bits = _u(buf, addr + 128, 2)
    root_block = _u(buf, addr + 132, 8)
    cur_rows = _u(buf, addr + 140, 2)
    if lookup3(buf[addr : addr + 142]) != _u(buf, addr + 142, 4):
        raise Hdf5FormatError("fractal heap header checksum mismatch")
    if cur_rows != 0:
        # root is an indirect block (a doubling table of direct blocks)
        raise Hdf5FormatError(
            "fractal heap with an indirect root block: outside the native "
            "subset (needs h5py)"
        )
    off_size = (max_heap_bits + 7) // 8
    len_size = (max(max_managed, 1).bit_length() + 7) // 8
    if buf[root_block : root_block + 4] != b"FHDB":
        raise Hdf5FormatError("fractal heap direct block signature missing")
    if _u(buf, root_block + 5, 8) != addr:
        raise Hdf5FormatError("direct block does not point back at its heap")
    # heap offsets address the heap's managed space, which BEGINS at the
    # root direct block's first byte (the FHDB signature) — so for the
    # block-offset-0 root direct case, file address = block + offset
    block_off_pos = root_block + 13
    if _u(buf, block_off_pos, off_size) != 0:
        raise Hdf5FormatError("root direct block offset != 0")
    del flags  # bit 1 = checksummed direct blocks; layout-identical here

    def read(hid: bytes) -> bytes:
        if (hid[0] >> 4) & 0x3 != 0:
            raise Hdf5FormatError(
                "huge/tiny fractal heap object id: outside the native subset"
            )
        off = _u(hid, 1, off_size)
        ln = _u(hid, 1 + off_size, len_size)
        return bytes(buf[root_block + off : root_block + off + ln])

    return read


def _v2_btree_heap_ids(buf: bytes, addr: int) -> list[bytes]:
    """Heap ids from a version-2 B-tree name index (spec III.A.2), type
    5 (group link name: lookup3 hash(4) + fractal heap id). Depth-0
    trees — root IS the leaf — cover libhdf5's dense groups up to the
    leaf capacity (node_size/record_size, ~185 links at the 2 KiB
    default); deeper trees gate to h5py."""
    if buf[addr : addr + 4] != b"BTHD":
        raise Hdf5FormatError("v2 B-tree header signature missing")
    if buf[addr + 4] != 0:
        raise Hdf5FormatError(f"v2 B-tree version {buf[addr + 4]}")
    btype = buf[addr + 5]
    if btype != 5:
        raise Hdf5FormatError(f"v2 B-tree type {btype}: want 5 (link names)")
    rec_size = _u(buf, addr + 10, 2)
    depth = _u(buf, addr + 12, 2)
    root = _u(buf, addr + 16, 8)
    root_nrec = _u(buf, addr + 24, 2)
    if lookup3(buf[addr : addr + 34]) != _u(buf, addr + 34, 4):
        raise Hdf5FormatError("v2 B-tree header checksum mismatch")
    if depth != 0:
        raise Hdf5FormatError(
            "v2 B-tree depth > 0 (very large dense group): outside the "
            "native subset (needs h5py)"
        )
    if buf[root : root + 4] != b"BTLF":
        raise Hdf5FormatError("v2 B-tree leaf signature missing")
    if buf[root + 5] != btype:
        raise Hdf5FormatError("v2 B-tree leaf type mismatch")
    end = root + 6 + root_nrec * rec_size
    if lookup3(buf[root:end]) != _u(buf, end, 4):
        raise Hdf5FormatError("v2 B-tree leaf checksum mismatch")
    return [
        bytes(buf[root + 6 + i * rec_size + 4 : root + 6 + (i + 1) * rec_size])
        for i in range(root_nrec)
    ]


def _dense_links(buf: bytes, fheap: int, name_btree: int) -> list[tuple[str, int]]:
    """Dense group storage (r12): the name-index v2 B-tree yields the
    fractal heap id of every link message; the heap yields the message
    bytes; each parses exactly like a compact Link message."""
    if name_btree == UNDEF:
        raise Hdf5FormatError("dense link storage without a name index")
    read = _fractal_heap_reader(buf, fheap)
    return [_parse_link(read(hid)) for hid in _v2_btree_heap_ids(buf, name_btree)]


def _parse_dataspace(body: bytes) -> list[int]:
    version = body[0]
    rank = body[1]
    if version == 1:
        off = 8  # version, rank, flags, 5 reserved
    elif version == 2:
        off = 4  # version, rank, flags, type
    else:
        raise Hdf5FormatError(f"dataspace version {version}")
    return [_u(body, off + 8 * i, 8) for i in range(rank)]


def _parse_datatype(body: bytes) -> np.dtype:
    cls = body[0] & 0x0F
    bits0 = body[1]
    size = _u(body, 4, 4)
    if bits0 & 0x01:
        raise Hdf5FormatError("big-endian datatype: outside the native subset")
    if cls == 0:  # fixed-point
        signed = bool(bits0 & 0x08)
        if size not in (2, 4, 8) or not signed:
            raise Hdf5FormatError(f"fixed-point size={size} signed={signed}")
        return np.dtype(f"<i{size}")
    if cls == 1:  # floating-point
        if size not in (4, 8):
            raise Hdf5FormatError(f"float size={size}")
        return np.dtype(f"<f{size}")
    raise Hdf5FormatError(f"datatype class {cls}: native tier reads numeric only")


def _parse_filters(body: bytes) -> list[tuple[int, int, list[int]]]:
    """(filter_id, flags, client_values) list from a Filter Pipeline
    message (type 0x000B, spec IV.A.2.l), versions 1 and 2. Order is
    the ENCODE order; decode applies the inverse chain reversed."""
    version = body[0]
    nf = body[1]
    if version == 1:
        pos = 8  # version, nfilters, 2 reserved, 4 reserved
    elif version == 2:
        pos = 2
    else:
        raise Hdf5FormatError(f"filter pipeline version {version}")
    filters: list[tuple[int, int, list[int]]] = []
    for _ in range(nf):
        fid = _u(body, pos, 2)
        pos += 2
        name_len = 0
        if version == 1 or fid >= 256:
            name_len = _u(body, pos, 2)
            pos += 2
        flags = _u(body, pos, 2)
        ncv = _u(body, pos + 2, 2)
        pos += 4 + name_len  # v1 name_len is already null-padded to 8
        cvals = [_u(body, pos + 4 * i, 4) for i in range(ncv)]
        pos += 4 * ncv
        if version == 1 and ncv % 2 == 1:
            pos += 4  # v1 pads an odd client-value count
        filters.append((fid, flags, cvals))
    return filters


def _unshuffle(raw: bytes, itemsize: int) -> bytes:
    """Inverse of the byte-shuffle filter (id 2): encoded layout is all
    byte-0s, then all byte-1s, ... — transpose back to interleaved."""
    if itemsize <= 1:
        return raw
    n = len(raw) // itemsize
    body = np.frombuffer(raw[: n * itemsize], dtype=np.uint8)
    return body.reshape(itemsize, n).T.tobytes() + raw[n * itemsize :]


def _apply_filters(
    raw: bytes,
    filters: list[tuple[int, int, list[int]]],
    filter_mask: int,
    max_bytes: int | None = None,
) -> bytes:
    """Run the decode-side filter chain (reverse of encode order; a set
    bit i in the chunk's filter mask means filter i was SKIPPED for
    that chunk). Native subset: deflate (zlib) and shuffle — the h5py
    ``compression='gzip', shuffle=True`` defaults; anything else gates
    to h5py with a typed error. ``max_bytes`` BOUNDS the inflate (r12
    fuzz contract): a deflate-bomb chunk in an untrusted payload must
    not materialize gigabytes before the size check — the caller knows
    the chunk's exact decoded size up front."""
    import zlib

    for i in range(len(filters) - 1, -1, -1):
        if filter_mask & (1 << i):
            continue
        fid, _flags, cvals = filters[i]
        if fid == FILTER_DEFLATE:
            if max_bytes is not None:
                d = zlib.decompressobj()
                raw = d.decompress(raw, max_bytes + 1)
                if len(raw) > max_bytes or d.unconsumed_tail:
                    raise Hdf5FormatError(
                        f"chunk inflates past its {max_bytes}-byte size"
                    )
            else:
                raw = zlib.decompress(raw)
        elif fid == FILTER_SHUFFLE:
            raw = _unshuffle(raw, cvals[0] if cvals else 1)
        else:
            raise Hdf5FormatError(
                f"filter id {fid}: native tier decodes deflate+shuffle only"
            )
    return raw


def _read_chunked(
    buf: bytes,
    layout_body: bytes,
    dims: list[int],
    dtype: np.dtype,
    filters: list[tuple[int, int, list[int]]],
) -> np.ndarray:
    """Assemble a chunked-layout dataset (layout message v3 class 2) by
    walking its version-1 B-tree chunk index (spec III.A.1, node type
    1): each leaf entry's key carries (stored nbytes, filter mask,
    chunk offset per dimension); the child address points at the raw —
    possibly filtered — chunk bytes. Edge chunks are stored FULL-SIZE
    (libhdf5 pads filtered edge chunks), so each decoded chunk is
    reshaped to the chunk shape and clipped into the dataset region."""
    ndim = layout_body[2]  # rank + 1 (trailing element-size dim)
    if ndim != len(dims) + 1:
        raise Hdf5FormatError(
            f"chunk dimensionality {ndim} != dataspace rank {len(dims)} + 1"
        )
    btree = _u(layout_body, 3, 8)
    cdims = [_u(layout_body, 11 + 4 * i, 4) for i in range(ndim)]
    chunk_shape = cdims[:-1]
    if cdims[-1] != dtype.itemsize:
        raise Hdf5FormatError(
            f"chunk element size {cdims[-1]} != dtype itemsize {dtype.itemsize}"
        )
    # math.prod on Python ints is exact — np.prod would silently WRAP
    # int64 on crafted huge dims and bypass both caps (r12, wave 3)
    import math

    total = math.prod(dims) * dtype.itemsize
    if total > MAX_DATASET_BYTES:
        raise Hdf5FormatError(
            f"dataset claims {total} bytes (> {MAX_DATASET_BYTES} cap)"
        )
    chunk_elems = math.prod(chunk_shape)
    # the chunk shape is attacker-controlled too: a tiny dataspace with
    # a gigantic declared chunk would otherwise set the deflate-bomb
    # inflate bound (max_bytes below) to gigabytes, defeating it
    if chunk_elems * dtype.itemsize > MAX_DATASET_BYTES:
        raise Hdf5FormatError(
            f"chunk claims {chunk_elems * dtype.itemsize} bytes "
            f"(> {MAX_DATASET_BYTES} cap)"
        )
    arr = np.zeros(dims, dtype=dtype)
    if btree == UNDEF:
        # libhdf5 legally leaves the chunk index unallocated for a
        # chunked dataset that was created but never written — the
        # dataset reads as all fill-value (default 0), mirroring the
        # contiguous-layout UNDEF branch (ADVICE r11)
        return arr
    key_size = 8 + 8 * ndim
    seen: set[int] = set()

    def walk(addr: int, depth: int) -> None:
        if addr in seen or depth > 32:
            raise Hdf5FormatError("chunk B-tree cycle or depth > 32")
        seen.add(addr)
        if buf[addr : addr + 4] != b"TREE":
            raise Hdf5FormatError("chunk B-tree signature missing")
        if buf[addr + 4] != 1:
            raise Hdf5FormatError(f"B-tree node type {buf[addr + 4]}: want 1 (chunks)")
        level = buf[addr + 5]
        n = _u(buf, addr + 6, 2)
        p = addr + 24  # sig(4) type(1) level(1) used(2) siblings(16)
        for i in range(n):
            k = p + i * (key_size + 8)
            nbytes = _u(buf, k, 4)
            fmask = _u(buf, k + 4, 4)
            offs = [_u(buf, k + 8 + 8 * j, 8) for j in range(ndim)]
            child = _u(buf, k + key_size, 8)
            if level > 0:
                walk(child, depth + 1)
                continue
            raw = _apply_filters(
                bytes(buf[child : child + nbytes]),
                filters,
                fmask,
                max_bytes=chunk_elems * dtype.itemsize,
            )
            if len(raw) < chunk_elems * dtype.itemsize:
                raise Hdf5FormatError(
                    f"chunk at {child:#x} decodes to {len(raw)} bytes, "
                    f"expected {chunk_elems * dtype.itemsize}"
                )
            chunk = np.frombuffer(
                raw[: chunk_elems * dtype.itemsize], dtype=dtype
            ).reshape(chunk_shape)
            region = tuple(
                slice(o, min(o + c, d))
                for o, c, d in zip(offs[:-1], chunk_shape, dims)
            )
            clip = tuple(slice(0, s.stop - s.start) for s in region)
            arr[region] = chunk[clip]

    walk(btree, 0)
    return arr


def _group_links(buf: bytes, btree_addr: int, heap_addr: int) -> list[tuple[str, int]]:
    """(name, object header address) pairs from a symbol-table group."""
    if buf[heap_addr : heap_addr + 4] != b"HEAP":
        raise Hdf5FormatError("local heap signature missing")
    heap_data = _u(buf, heap_addr + 24, 8)

    def name_at(offset: int) -> str:
        end = buf.index(b"\x00", heap_data + offset)
        return buf[heap_data + offset : end].decode("utf-8")

    out: list[tuple[str, int]] = []
    seen: set[int] = set()

    def walk(addr: int, depth: int = 0) -> None:
        # crafted payloads can point a child back at an ancestor — the
        # same guard as the chunk-index walk (r12 fuzz contract: a
        # cycle must be a typed error, never a RecursionError escaping
        # the boundary)
        if addr in seen or depth > 32:
            raise Hdf5FormatError("group B-tree cycle or depth > 32")
        seen.add(addr)
        if buf[addr : addr + 4] != b"TREE":
            raise Hdf5FormatError("group B-tree signature missing")
        level = buf[addr + 5]
        n = _u(buf, addr + 6, 2)
        # keys/children start after sig(4) type(1) level(1) used(2) sibs(16)
        p = addr + 24
        children = [_u(buf, p + 8 + 16 * i, 8) for i in range(n)]
        for child in children:
            if level > 0:
                walk(child, depth + 1)
            else:
                if buf[child : child + 4] != b"SNOD":
                    raise Hdf5FormatError("symbol node signature missing")
                n_sym = _u(buf, child + 6, 2)
                for s in range(n_sym):
                    ste = child + 8 + 40 * s
                    out.append((name_at(_u(buf, ste, 8)), _u(buf, ste + 8, 8)))

    walk(btree_addr)
    return out


# the decode boundary's resource guard: a crafted dataspace can claim
# astronomically large dims (2^60 elements) and make the fill-value /
# chunk-assembly paths attempt the allocation — lake payloads are
# untrusted input, so materialization is capped well above any real
# archive (the reference's vibration files are MBs)
MAX_DATASET_BYTES = 1 << 31  # 2 GiB per dataset


def read_h5_datasets(content: bytes) -> dict[str, np.ndarray]:
    """Decode every numeric dataset in the root group of a classic-format
    HDF5 payload. Raises :class:`Hdf5FormatError` — and ONLY that — for
    payloads outside the documented subset or malformed/corrupt bytes
    (caller decides the fallback tier). The boundary wrapper converts
    stray parse-time exceptions (truncated buffers indexing short,
    struct/zlib errors, absurd claimed sizes) into the typed error so
    one hostile byte can never abort a whole scan stage (r12 fuzz
    contract; the OCHK cycle guard's sibling)."""
    import struct as _struct
    import zlib as _zlib

    try:
        return _read_h5_datasets(content)
    except Hdf5FormatError:
        raise
    except (
        IndexError,
        KeyError,
        OverflowError,
        MemoryError,
        RecursionError,  # defense-in-depth; walks carry their own guards
        UnicodeDecodeError,
        _struct.error,
        _zlib.error,
        ValueError,
    ) as exc:
        raise Hdf5FormatError(
            f"malformed HDF5 payload: {type(exc).__name__}: {exc}"
        ) from exc


def _read_h5_datasets(content: bytes) -> dict[str, np.ndarray]:
    if content[:8] != SIGNATURE:
        raise Hdf5FormatError("HDF5 signature missing")
    sb_version = content[8]
    if sb_version in (0, 1):
        if content[13] != 8 or content[14] != 8:
            raise Hdf5FormatError("non-8-byte offsets/lengths")
        # root symbol table entry sits after the fixed part (24 bytes
        # for v0; v1 appends Indexed Storage Internal Node K(2) +
        # reserved(2) -> 28) + 4 file addresses; its object header
        # field is at entry + 8
        fixed = 24 if sb_version == 0 else 28
        root_header = _u(content, fixed + 32 + 8, 8)
    elif sb_version in (2, 3):
        # v2/v3 (spec II.A.2): sig(8) ver(1) sizeof_offsets(1)
        # sizeof_lengths(1) flags(1) base(8) ext(8) eof(8) root_oh(8)
        # checksum(4) — checksummed over the first 44 bytes
        if content[9] != 8 or content[10] != 8:
            raise Hdf5FormatError("non-8-byte offsets/lengths")
        if lookup3(content[:44]) != _u(content, 44, 4):
            raise Hdf5FormatError("superblock v2/v3 checksum mismatch")
        root_header = _u(content, 36, 8)
    else:
        raise Hdf5FormatError(
            f"superblock version {sb_version}: native tier reads v0/v1/v2/v3"
        )
    msgs = _parse_object_header(content, root_header)
    out: dict[str, np.ndarray] = {}
    for name, obj_addr in _collect_links(content, msgs):
        dims: list[int] | None = None
        dtype: np.dtype | None = None
        raw: bytes | None = None
        contiguous_undef = False  # UNDEF address tracked explicitly
        layout_chunked: bytes | None = None
        filters: list[tuple[int, int, list[int]]] = []
        for mtype, body in _parse_object_header(content, obj_addr):
            if mtype == MSG_DATASPACE:
                dims = _parse_dataspace(body)
            elif mtype == MSG_DATATYPE:
                dtype = _parse_datatype(body)
            elif mtype == MSG_FILTER:
                filters = _parse_filters(body)
            elif mtype == MSG_LAYOUT:
                if body[0] != 3:
                    raise Hdf5FormatError(f"layout message version {body[0]}")
                lclass = body[1]
                if lclass == 0:  # compact: size(2) then raw data
                    raw = bytes(body[4 : 4 + _u(body, 2, 2)])
                elif lclass == 1:  # contiguous: address(8) size(8)
                    # ADVICE r12: a defined address with a corrupt
                    # size-0 field must NOT alias the legitimate
                    # UNDEF-address never-written case — track UNDEF
                    # with its own sentinel so the b"" ambiguity can't
                    # silently zero-fill corruption
                    address, size = _u(body, 2, 8), _u(body, 10, 8)
                    if address == UNDEF:
                        contiguous_undef = True
                        raw = b""
                    else:
                        raw = bytes(content[address : address + size])
                elif lclass == 2:  # chunked: B-tree v1 index (r11)
                    layout_chunked = body
                else:
                    raise Hdf5FormatError(f"layout class {lclass}")
        if dims is None or dtype is None:
            continue  # a sub-group or non-dataset object: skip
        if layout_chunked is not None:
            out[name] = _read_chunked(content, layout_chunked, dims, dtype, filters)
            continue
        if raw is None:
            continue
        import math

        n = math.prod(dims) if dims else 1  # exact; np.prod wraps int64
        if n * dtype.itemsize > MAX_DATASET_BYTES:
            raise Hdf5FormatError(
                f"dataset '{name}' claims {n * dtype.itemsize} bytes "
                f"(> {MAX_DATASET_BYTES} cap)"
            )
        if contiguous_undef:
            # a never-written contiguous dataset (address UNDEF) reads
            # as fill-value zeros, same as the chunked UNDEF branch
            raw = b"\x00" * (n * dtype.itemsize)
        elif len(raw) < n * dtype.itemsize:
            # a short NON-empty read is file truncation/corruption —
            # escalate loudly rather than silently zero-filling the tail
            raise Hdf5FormatError(
                f"dataset '{name}': {len(raw)} bytes stored, "
                f"{n * dtype.itemsize} expected (truncated file?)"
            )
        arr = np.frombuffer(raw[: n * dtype.itemsize], dtype=dtype)
        out[name] = arr.reshape(dims) if dims else arr
    return out


# --------------------------------------------------------------------------
# writer (fixture/golden-file generator; classic layout, spec-conformant)
# --------------------------------------------------------------------------


def write_minimal_h5(
    datasets: dict[str, np.ndarray], sb_version: int = 0
) -> bytes:
    """Serialize ``datasets`` (numeric numpy arrays, root group, flat) as
    a classic-format HDF5 byte string readable by :func:`read_h5_datasets`
    and by any libhdf5. Capacity: up to ``2 * _BTREE_K`` datasets (one
    symbol leaf node) — plenty for fixture archives. ``sb_version=1``
    writes the v1 superblock variant (v0 + Indexed Storage Internal
    Node K + 2 reserved bytes in the fixed part; spec II.A.1) — the
    layout libhdf5 emits when shared object headers were requested."""
    if sb_version not in (0, 1):
        raise ValueError(f"classic writer supports superblock v0/v1, got {sb_version}")
    items = sorted(
        (name, np.ascontiguousarray(arr)) for name, arr in datasets.items()
    )
    if len(items) > 2 * _BTREE_K:
        raise ValueError(f"native writer capacity is {2 * _BTREE_K} datasets")

    buf = bytearray()

    def alloc(n: int, align: int = 8) -> int:
        while len(buf) % align:
            buf.append(0)
        addr = len(buf)
        buf.extend(b"\x00" * n)
        return addr

    def put(addr: int, data: bytes) -> None:
        buf[addr : addr + len(data)] = data

    def msg(mtype: int, body: bytes) -> bytes:
        pad = (-len(body)) % 8
        body += b"\x00" * pad
        return struct.pack("<HHB3x", mtype, len(body), 0) + body

    def object_header(messages: list[bytes]) -> int:
        block = b"".join(messages)
        addr = alloc(16 + len(block))
        put(addr, struct.pack("<BxHII4x", 1, len(messages), 1, len(block)))
        put(addr + 16, block)
        return addr

    def dtype_msg(dt: np.dtype) -> bytes:
        if dt.kind == "f":
            exp = {4: (23, 8, 127), 8: (52, 11, 1023)}[dt.itemsize]
            man_size, exp_size, bias = exp
            body = struct.pack(
                "<BBBxI", (1 << 4) | 1, 0x20, dt.itemsize * 8 - 1, dt.itemsize
            ) + struct.pack(
                "<HHBBBBI", 0, dt.itemsize * 8, man_size, exp_size, 0, man_size, bias
            )
            return msg(MSG_DATATYPE, body)
        if dt.kind == "i":
            body = struct.pack("<BBBxI", (1 << 4) | 0, 0x08, 0, dt.itemsize)
            body += struct.pack("<HH", 0, dt.itemsize * 8)
            return msg(MSG_DATATYPE, body)
        raise ValueError(f"native writer supports numeric dtypes, got {dt}")

    # superblock: fixed part + 4 file addresses + root symbol table entry
    fixed = 24 if sb_version == 0 else 28
    sb = alloc(fixed + 32 + 40)
    put(sb, SIGNATURE + struct.pack(
        "<BBBxBBBxHHI", sb_version, 0, 0, 0, 8, 8, _BTREE_K, 16, 0))
    if sb_version == 1:  # Indexed Storage Internal Node K + reserved
        put(sb + 24, struct.pack("<HH", 32, 0))
    put(sb + fixed, struct.pack("<QQQQ", 0, UNDEF, UNDEF, UNDEF))  # eof patched below

    # local heap: 8 zero bytes (offset 0 = empty root link name) + names
    names_blob = bytearray(b"\x00" * 8)
    name_off: dict[str, int] = {}
    for name, _ in items:
        name_off[name] = len(names_blob)
        names_blob += name.encode("utf-8") + b"\x00"
        while len(names_blob) % 8:
            names_blob += b"\x00"
    heap_data = alloc(len(names_blob))
    put(heap_data, bytes(names_blob))
    heap = alloc(32)
    put(heap, b"HEAP" + struct.pack("<B3xQQQ", 0, len(names_blob), UNDEF, heap_data))

    # dataset object headers + contiguous data
    obj_addr: dict[str, int] = {}
    for name, arr in items:
        data_addr = alloc(arr.nbytes)
        put(data_addr, arr.astype(arr.dtype.newbyteorder("<")).tobytes())
        space = struct.pack("<BBB5x", 1, arr.ndim, 0) + b"".join(
            struct.pack("<Q", d) for d in arr.shape
        )
        layout = struct.pack("<BBQQ", 3, 1, data_addr, arr.nbytes)
        obj_addr[name] = object_header(
            [msg(MSG_DATASPACE, space), dtype_msg(arr.dtype), msg(MSG_LAYOUT, layout)]
        )

    # one SNOD leaf (entries sorted by name) + its B-tree root
    snod = alloc(8 + 2 * _BTREE_K * 40)
    put(snod, b"SNOD" + struct.pack("<BxH", 1, len(items)))
    for i, (name, _) in enumerate(items):
        put(
            snod + 8 + 40 * i,
            struct.pack("<QQI4x16x", name_off[name], obj_addr[name], 0),
        )
    btree = alloc(24 + 8 + 16 * 1)
    last_key = name_off[items[-1][0]] if items else 0
    put(
        btree,
        b"TREE"
        + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF)
        + struct.pack("<QQQ", 0, snod, last_key),
    )

    # root group object header + the superblock's cached root entry
    root = object_header([msg(MSG_SYMBOL_TABLE, struct.pack("<QQ", btree, heap))])
    put(sb + fixed + 32, struct.pack("<QQI4xQQ", 0, root, 1, btree, heap))
    # end-of-file address (3rd file address; base addr at +fixed stays 0)
    put(sb + fixed + 16, struct.pack("<Q", len(buf)))
    return bytes(buf)


def write_minimal_h5_chunked(
    datasets: dict[str, np.ndarray],
    chunk_shape: dict[str, tuple[int, ...]] | None = None,
    gzip_level: int = 6,
    shuffle: bool = False,
    unwritten: tuple[str, ...] = (),
) -> bytes:
    """Serialize ``datasets`` as a classic-format HDF5 byte string with
    CHUNKED layout and a deflate (gzip) filter pipeline — libhdf5's
    default shape for real archives (``h5py.create_dataset(...,
    compression='gzip')``); optional byte-shuffle in front of deflate
    (``shuffle=True``), matching h5py's other default knob. Chunks are
    indexed by a version-1 B-tree (node type 1, single level-0 node);
    edge chunks are stored full-size, zero-padded before filtering,
    exactly as libhdf5 stores filtered edge chunks. Readable by
    :func:`read_h5_datasets` (the r11 chunk tier) and by any libhdf5.

    ``chunk_shape`` maps dataset name -> chunk dims; the default splits
    the first dimension in ~3 so every fixture exercises multiple
    chunks plus a partial edge chunk. Names in ``unwritten`` are emitted
    as created-but-never-written (B-tree address UNDEF, no chunk data)
    — the layout libhdf5 leaves for an allocated-on-write chunked
    dataset nothing was stored into (ADVICE r11 fixture)."""
    import zlib

    items = sorted(
        (name, np.ascontiguousarray(arr)) for name, arr in datasets.items()
    )
    if len(items) > 2 * _BTREE_K:
        raise ValueError(f"native writer capacity is {2 * _BTREE_K} datasets")

    buf = bytearray()

    def alloc(n: int, align: int = 8) -> int:
        while len(buf) % align:
            buf.append(0)
        addr = len(buf)
        buf.extend(b"\x00" * n)
        return addr

    def put(addr: int, data: bytes) -> None:
        buf[addr : addr + len(data)] = data

    def msg(mtype: int, body: bytes) -> bytes:
        pad = (-len(body)) % 8
        body += b"\x00" * pad
        return struct.pack("<HHB3x", mtype, len(body), 0) + body

    def object_header(messages: list[bytes]) -> int:
        block = b"".join(messages)
        addr = alloc(16 + len(block))
        put(addr, struct.pack("<BxHII4x", 1, len(messages), 1, len(block)))
        put(addr + 16, block)
        return addr

    def dtype_msg(dt: np.dtype) -> bytes:
        if dt.kind == "f":
            man_size, exp_size, bias = {4: (23, 8, 127), 8: (52, 11, 1023)}[dt.itemsize]
            body = struct.pack(
                "<BBBxI", (1 << 4) | 1, 0x20, dt.itemsize * 8 - 1, dt.itemsize
            ) + struct.pack(
                "<HHBBBBI", 0, dt.itemsize * 8, man_size, exp_size, 0, man_size, bias
            )
            return msg(MSG_DATATYPE, body)
        if dt.kind == "i":
            body = struct.pack("<BBBxI", (1 << 4) | 0, 0x08, 0, dt.itemsize)
            body += struct.pack("<HH", 0, dt.itemsize * 8)
            return msg(MSG_DATATYPE, body)
        raise ValueError(f"native writer supports numeric dtypes, got {dt}")

    def filter_msg(itemsize: int) -> bytes:
        # pipeline v1; encode order: [shuffle,] deflate
        chain = []
        if shuffle:
            chain.append((FILTER_SHUFFLE, [itemsize]))
        chain.append((FILTER_DEFLATE, [gzip_level]))
        body = struct.pack("<BB6x", 1, len(chain))
        for fid, cvals in chain:
            body += struct.pack("<HHHH", fid, 0, 0, len(cvals))
            body += b"".join(struct.pack("<I", v) for v in cvals)
            if len(cvals) % 2 == 1:
                body += b"\x00" * 4
        return msg(MSG_FILTER, body)

    sb = alloc(24 + 32 + 40)
    put(sb, SIGNATURE + struct.pack("<BBBxBBBxHHI", 0, 0, 0, 0, 8, 8, _BTREE_K, 16, 0))
    put(sb + 24, struct.pack("<QQQQ", 0, UNDEF, UNDEF, UNDEF))

    names_blob = bytearray(b"\x00" * 8)
    name_off: dict[str, int] = {}
    for name, _ in items:
        name_off[name] = len(names_blob)
        names_blob += name.encode("utf-8") + b"\x00"
        while len(names_blob) % 8:
            names_blob += b"\x00"
    heap_data = alloc(len(names_blob))
    put(heap_data, bytes(names_blob))
    heap = alloc(32)
    put(heap, b"HEAP" + struct.pack("<B3xQQQ", 0, len(names_blob), UNDEF, heap_data))

    obj_addr: dict[str, int] = {}
    for name, arr in items:
        cshape = (chunk_shape or {}).get(
            name, (max(1, arr.shape[0] // 3 + 1),) + arr.shape[1:]
        )
        if len(cshape) != arr.ndim:
            raise ValueError(f"chunk rank {len(cshape)} != array rank {arr.ndim}")
        ndim = arr.ndim + 1
        key_size = 8 + 8 * ndim
        # write every chunk (row-major offset grid), full-size padded
        entries: list[tuple[int, list[int], int]] = []  # (nbytes, offs, addr)
        grid = [range(0, d, c) for d, c in zip(arr.shape, cshape)]
        import itertools

        if name in unwritten:
            grid = [range(0)]  # no chunks stored; index stays UNDEF
        for offs in itertools.product(*grid):
            region = tuple(
                slice(o, min(o + c, d)) for o, c, d in zip(offs, cshape, arr.shape)
            )
            chunk = np.zeros(cshape, dtype=arr.dtype)
            chunk[tuple(slice(0, s.stop - s.start) for s in region)] = arr[region]
            raw = chunk.astype(arr.dtype.newbyteorder("<")).tobytes()
            if shuffle:
                n_el = len(raw) // arr.dtype.itemsize
                raw = (
                    np.frombuffer(raw, dtype=np.uint8)
                    .reshape(n_el, arr.dtype.itemsize)
                    .T.tobytes()
                )
            raw = zlib.compress(raw, gzip_level)
            caddr = alloc(len(raw))
            put(caddr, raw)
            entries.append((len(raw), list(offs) + [0], caddr))
        if name in unwritten:
            btree = UNDEF
        else:
            n = len(entries)
            btree = alloc(24 + (n + 1) * key_size + n * 8)
            put(btree, b"TREE" + struct.pack("<BBHQQ", 1, 0, n, UNDEF, UNDEF))
            p = btree + 24
            for nbytes, offs, caddr in entries:
                put(p, struct.pack("<II", nbytes, 0)
                    + b"".join(struct.pack("<Q", o) for o in offs))
                put(p + key_size, struct.pack("<Q", caddr))
                p += key_size + 8
            # the rightmost key: offsets one chunk-grid step past the end
            end_offs = [
                ((d + c - 1) // c) * c for d, c in zip(arr.shape, cshape)
            ] + [0]
            put(p, struct.pack("<II", 0, 0)
                + b"".join(struct.pack("<Q", o) for o in end_offs))

        space = struct.pack("<BBB5x", 1, arr.ndim, 0) + b"".join(
            struct.pack("<Q", d) for d in arr.shape
        )
        layout = struct.pack("<BBBQ", 3, 2, ndim, btree) + b"".join(
            struct.pack("<I", c) for c in list(cshape) + [arr.dtype.itemsize]
        )
        obj_addr[name] = object_header(
            [
                msg(MSG_DATASPACE, space),
                dtype_msg(arr.dtype),
                filter_msg(arr.dtype.itemsize),
                msg(MSG_LAYOUT, layout),
            ]
        )

    snod = alloc(8 + 2 * _BTREE_K * 40)
    put(snod, b"SNOD" + struct.pack("<BxH", 1, len(items)))
    for i, (name, _) in enumerate(items):
        put(
            snod + 8 + 40 * i,
            struct.pack("<QQI4x16x", name_off[name], obj_addr[name], 0),
        )
    btree = alloc(24 + 8 + 16 * 1)
    last_key = name_off[items[-1][0]] if items else 0
    put(
        btree,
        b"TREE"
        + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF)
        + struct.pack("<QQQ", 0, snod, last_key),
    )
    root = object_header([msg(MSG_SYMBOL_TABLE, struct.pack("<QQ", btree, heap))])
    put(sb + 56, struct.pack("<QQI4xQQ", 0, root, 1, btree, heap))
    put(sb + 40, struct.pack("<Q", len(buf)))
    return bytes(buf)


def write_minimal_h5_v2(datasets: dict[str, np.ndarray]) -> bytes:
    """Serialize ``datasets`` as a ``libver='latest'``-style HDF5 byte
    string: superblock version 3, version-2 (``OHDR``) object headers
    with lookup3 checksums, and COMPACT link-message group storage —
    structurally what h5py writes for a small latest-format archive
    (h5py keeps links compact up to 8 members before going dense).
    Readable by :func:`read_h5_datasets` and by any libhdf5 >= 1.10.
    Capacity bounded at 8 datasets to stay inside the compact-link
    regime this writer models; :func:`write_minimal_h5_dense` is the
    past-8-links layout."""
    return _write_v2_family(datasets, dense=False)


def write_minimal_h5_dense(datasets: dict[str, np.ndarray]) -> bytes:
    """Serialize ``datasets`` with DENSE root-group link storage (r12):
    superblock v3 + OHDR object headers as :func:`write_minimal_h5_v2`,
    but the links live as managed objects in a fractal heap (one
    direct-block root, spec III.E/III.F) indexed by a type-5 version-2
    B-tree (depth 0, records = lookup3(name) hash + 7-byte heap id,
    hash-ordered) — the layout libhdf5 switches to when a group exceeds
    max_compact=8 links. Capacity ~180 links (one leaf node at the 2
    KiB default node size), matching the native reader's depth-0 /
    direct-root subset."""
    return _write_v2_family(datasets, dense=True)


def _write_v2_family(datasets: dict[str, np.ndarray], dense: bool) -> bytes:
    items = sorted(
        (name, np.ascontiguousarray(arr)) for name, arr in datasets.items()
    )
    if not dense and len(items) > 8:
        raise ValueError("v2 native writer capacity is 8 datasets (compact links)")
    if dense and len(items) > 180:
        raise ValueError(
            "dense native writer capacity is 180 datasets (one v2 B-tree leaf)"
        )

    # superblock v3 occupies file offsets [0, 48); the object graph is
    # built after it, so every address below is already final (the
    # OHDR checksums cover the addresses — no byte-patching afterward)
    sb_size = 48
    buf = bytearray()

    def alloc(n: int, align: int = 8) -> int:
        while (len(buf) + sb_size) % align:
            buf.append(0)
        addr = len(buf) + sb_size
        buf.extend(b"\x00" * n)
        return addr

    def put(addr: int, data: bytes) -> None:
        buf[addr - sb_size : addr - sb_size + len(data)] = data

    def msg_v2(mtype: int, body: bytes) -> bytes:
        # v2 message header: type(1) size(2) flags(1); no alignment pad
        return struct.pack("<BHB", mtype, len(body), 0) + body

    def object_header_v2(messages: list[bytes]) -> int:
        block = b"".join(messages)
        # OHDR flags 0x02: chunk0-size field is 4 bytes, nothing else
        head = b"OHDR" + struct.pack("<BBI", 2, 0x02, len(block))
        addr = alloc(len(head) + len(block) + 4)
        put(addr, head + block)
        whole = bytes(buf[addr - sb_size : addr - sb_size + len(head) + len(block)])
        put(addr + len(head) + len(block), struct.pack("<I", lookup3(whole)))
        return addr

    def dtype_body(dt: np.dtype) -> bytes:
        if dt.kind == "f":
            man_size, exp_size, bias = {4: (23, 8, 127), 8: (52, 11, 1023)}[dt.itemsize]
            return struct.pack(
                "<BBBxI", (1 << 4) | 1, 0x20, dt.itemsize * 8 - 1, dt.itemsize
            ) + struct.pack(
                "<HHBBBBI", 0, dt.itemsize * 8, man_size, exp_size, 0, man_size, bias
            )
        if dt.kind == "i":
            return struct.pack("<BBBxI", (1 << 4) | 0, 0x08, 0, dt.itemsize) + struct.pack(
                "<HH", 0, dt.itemsize * 8
            )
        raise ValueError(f"native writer supports numeric dtypes, got {dt}")

    # dataset object headers (v2) + contiguous data
    obj_addr: dict[str, int] = {}
    for name, arr in items:
        data_addr = alloc(arr.nbytes)
        put(data_addr, arr.astype(arr.dtype.newbyteorder("<")).tobytes())
        # dataspace v2: version(1) rank(1) flags(1) type(1) dims
        space = struct.pack("<BBBB", 2, arr.ndim, 0, 1) + b"".join(
            struct.pack("<Q", d) for d in arr.shape
        )
        layout = struct.pack("<BBQQ", 3, 1, data_addr, arr.nbytes)
        obj_addr[name] = object_header_v2(
            [
                msg_v2(MSG_DATASPACE, space),
                msg_v2(MSG_DATATYPE, dtype_body(arr.dtype)),
                msg_v2(MSG_LAYOUT, layout),
            ]
        )

    def link_body(name: str) -> bytes:
        nb = name.encode("utf-8")
        # link flags 0x00: 1-byte name length, hard link (no type field)
        return struct.pack("<BBB", 1, 0x00, len(nb)) + nb + struct.pack(
            "<Q", obj_addr[name]
        )

    group_info = struct.pack("<BB", 0, 0)
    if not dense:
        # root group: Link Info (compact: no fractal heap, no name
        # index), Group Info, then one hard Link message per dataset
        link_info = struct.pack("<BBQQ", 0, 0, UNDEF, UNDEF)
        root_msgs = [
            msg_v2(MSG_LINK_INFO, link_info),
            msg_v2(MSG_GROUP_INFO, group_info),
        ]
        root_msgs += [msg_v2(MSG_LINK, link_body(n)) for n, _ in items]
    else:
        # DENSE storage: link messages become managed objects in a
        # fractal heap with a single direct-block root; a type-5 v2
        # B-tree (depth 0) indexes them by lookup3(name)
        bodies = [link_body(n) for n, _ in items]
        max_heap_bits, max_managed = 32, 4096
        off_size = (max_heap_bits + 7) // 8  # 4
        len_size = (max_managed.bit_length() + 7) // 8  # 2
        id_len = 1 + off_size + len_size  # 7 — libhdf5's dense-link id
        db_header = 4 + 1 + 8 + off_size  # sig ver heap_hdr block_offset
        need = db_header + sum(len(b) for b in bodies)
        block_size = max(512, 1 << (need - 1).bit_length())  # doubling row 0
        fheap = alloc(146)
        dblock = alloc(block_size)
        # heap ids + object placement (offsets address managed space,
        # which starts at the direct block's first byte)
        heap_ids: dict[str, bytes] = {}
        pos = db_header
        payload = bytearray()
        for (name, _), body in zip(items, bodies):
            heap_ids[name] = (
                b"\x00"
                + pos.to_bytes(off_size, "little")
                + len(body).to_bytes(len_size, "little")
            )
            payload += body
            pos += len(body)
        put(dblock, b"FHDB" + struct.pack("<BQ", 0, fheap)
            + (0).to_bytes(off_size, "little") + bytes(payload))
        hdr = b"FRHP" + struct.pack(
            "<BHHBI", 0, id_len, 0, 0, max_managed
        )
        hdr += struct.pack("<QQ", 0, UNDEF)  # next huge id, huge btree
        free_space = block_size - pos
        hdr += struct.pack("<QQ", free_space, UNDEF)  # free space, fs mgr
        hdr += struct.pack("<QQ", block_size, block_size)  # managed, alloc
        hdr += struct.pack("<QQ", pos, len(items))  # iterator, n managed
        hdr += struct.pack("<QQQQ", 0, 0, 0, 0)  # huge/tiny sizes+counts
        hdr += struct.pack("<HQQ", 4, block_size, 65536)  # width, start, max direct
        hdr += struct.pack("<HHQH", max_heap_bits, 1, dblock, 0)
        hdr += struct.pack("<I", lookup3(hdr))
        put(fheap, hdr)
        # type-5 records (hash, heap id), hash-ordered as the index sorts
        rec_size = 4 + id_len
        recs = sorted(
            (lookup3(n.encode("utf-8")), heap_ids[n]) for n, _ in items
        )
        leaf = b"BTLF" + struct.pack("<BB", 0, 5) + b"".join(
            struct.pack("<I", h) + hid for h, hid in recs
        )
        leaf_addr = alloc(len(leaf) + 4)
        put(leaf_addr, leaf + struct.pack("<I", lookup3(leaf)))
        node_size = 2048
        bt = b"BTHD" + struct.pack(
            "<BBIHHBBQHQ", 0, 5, node_size, rec_size, 0, 100, 40,
            leaf_addr, len(recs), len(recs),
        )
        bt_addr = alloc(len(bt) + 4)
        put(bt_addr, bt + struct.pack("<I", lookup3(bt)))
        link_info = struct.pack("<BBQQ", 0, 0, fheap, bt_addr)
        root_msgs = [
            msg_v2(MSG_LINK_INFO, link_info),
            msg_v2(MSG_GROUP_INFO, group_info),
        ]
    root = object_header_v2(root_msgs)

    eof = sb_size + len(buf)
    sb = SIGNATURE + struct.pack("<BBBB", 3, 8, 8, 0) + struct.pack(
        "<QQQQ", 0, UNDEF, eof, root
    )
    sb += struct.pack("<I", lookup3(sb))
    return bytes(sb + buf)
