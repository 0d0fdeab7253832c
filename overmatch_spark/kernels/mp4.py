"""Real ISO BMFF (MP4) demuxer + Motion-JPEG muxer, pure stdlib.

Container parsing is byte arithmetic, not codec work, so nothing here
needs a media library: the demuxer walks the ISO/IEC 14496-12 box tree
(`ftyp`/`moov`/`trak`/`mdia`/`minf`/`stbl`), reads the sample tables
(`stsd` dims, `stts` timing, `stsc` chunk mapping, `stsz` sizes,
`stco`/`co64` chunk offsets) and resolves every sample to an absolute
(offset, size) byte range in `mdat`. That is exactly the seek path a
100-TB video pipeline uses: FRAME SELECTION happens on table metadata
only; sample bytes are sliced — and decoded — for the sampled frames
alone, never for the frames in between.

The muxer writes a spec-shaped Motion-JPEG file (VisualSampleEntry
fourcc ``jpeg``, one JFIF image per sample — encoded by the in-tree
pure-numpy baseline JPEG codec, kernels/jpeg.py), so the mp4 video
path is real END TO END in this sandbox: real container, real codec.
H.264/VP9 sample *decode* is the only remaining external dependency
and raises a clear error at the decode line, not at demux time.

Reference parity note: the reference repo has no video path at all —
this extends the engine for the BASELINE.json image+caption corpus
shape (multimodal payload columns as opaque binary + typed metadata).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_FULL = 8  # size + fourcc
_MJPEG_FOURCC = b"jpeg"  # QuickTime/ISO Motion-JPEG VisualSampleEntry


# 32-bit wire-format ceilings (module constants so tests can lower
# them to exercise the 64-bit paths without materializing 4 GiB)
_BOX32_MAX = 0xFFFFFFFF  # max 32-bit box size
_STCO_MAX = 0xFFFFFFFF  # max stco chunk offset


def _box(fourcc: bytes, payload: bytes) -> bytes:
    """Box with automatic largesize form (size==1 + 64-bit size after
    the fourcc, ISO 14496-12 §4.2) once 8+len(payload) overflows
    32 bits — the writer half of walk_boxes's largesize support."""
    if 8 + len(payload) > _BOX32_MAX:
        return (
            struct.pack(">I", 1)
            + fourcc
            + struct.pack(">Q", 16 + len(payload))
            + payload
        )
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full_box(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + payload)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def walk_boxes(buf, start: int = 0, end: int | None = None):
    """Yield (fourcc, payload_start, payload_end) for each top-level
    box in buf[start:end]; handles 64-bit largesize and size==0
    (to-end-of-enclosure) per ISO 14496-12 §4.2."""
    end = len(buf) if end is None else end
    pos = start
    while pos + _FULL <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        fourcc = bytes(buf[pos + 4:pos + 8])
        head = _FULL
        if size == 1:
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            head = _FULL + 8
        elif size == 0:
            size = end - pos
        if size < head or pos + size > end:
            raise ValueError(
                f"malformed box {fourcc!r} at {pos}: size {size}"
            )
        yield fourcc, pos + head, pos + size
        pos += size


def _find(buf, fourcc: bytes, start: int, end: int) -> tuple[int, int]:
    for fc, s, e in walk_boxes(buf, start, end):
        if fc == fourcc:
            return s, e
    raise ValueError(f"box {fourcc!r} not found")


@dataclass
class Mp4Track:
    """Parsed video track: per-sample absolute byte ranges + metadata.

    ``offsets[i]``/``sizes[i]`` locate sample i in the file — the
    demux product; slicing is the caller's (cheap) job."""

    width: int
    height: int
    n_samples: int
    fps: float
    timescale: int
    codec: str
    offsets: list[int] = field(repr=False, default_factory=list)
    sizes: list[int] = field(repr=False, default_factory=list)

    def sample_range(self, idx: int) -> tuple[int, int]:
        if not 0 <= idx < self.n_samples:
            raise IndexError(idx)
        return self.offsets[idx], self.offsets[idx] + self.sizes[idx]


def is_mp4(buf) -> bool:
    return len(buf) >= 12 and bytes(buf[4:8]) == b"ftyp"


def parse_mp4(buf) -> Mp4Track:
    """Demux the first video track. Pure table walk — `mdat` bytes are
    never touched here, so parse cost is O(sample-table), independent
    of media size."""
    if not is_mp4(buf):
        raise ValueError("not an ISO BMFF file (no ftyp)")
    moov_s, moov_e = _find(buf, b"moov", 0, len(buf))
    for fc, trak_s, trak_e in walk_boxes(buf, moov_s, moov_e):
        if fc != b"trak":
            continue
        mdia_s, mdia_e = _find(buf, b"mdia", trak_s, trak_e)
        hdlr_s, _ = _find(buf, b"hdlr", mdia_s, mdia_e)
        if bytes(buf[hdlr_s + 8:hdlr_s + 12]) != b"vide":
            continue
        mdhd_s, _ = _find(buf, b"mdhd", mdia_s, mdia_e)
        version = buf[mdhd_s]
        if version == 1:
            (timescale,) = struct.unpack_from(">I", buf, mdhd_s + 20)
        else:
            (timescale,) = struct.unpack_from(">I", buf, mdhd_s + 12)
        minf_s, minf_e = _find(buf, b"minf", mdia_s, mdia_e)
        stbl_s, stbl_e = _find(buf, b"stbl", minf_s, minf_e)
        return _parse_stbl(buf, stbl_s, stbl_e, timescale)
    raise ValueError("no video track in moov")


def _parse_stbl(buf, s: int, e: int, timescale: int) -> Mp4Track:
    # stsd: dims + codec fourcc from the first VisualSampleEntry
    stsd_s, _ = _find(buf, b"stsd", s, e)
    entry = stsd_s + 8  # skip ver/flags + entry_count
    codec = bytes(buf[entry + 4:entry + 8]).decode("latin1")
    width, height = struct.unpack_from(">HH", buf, entry + 32)

    # stts: fps from the first run's delta (constant-rate mux writes 1)
    stts_s, _ = _find(buf, b"stts", s, e)
    (n_runs,) = struct.unpack_from(">I", buf, stts_s + 4)
    fps = 0.0
    if n_runs:
        _cnt, delta = struct.unpack_from(">II", buf, stts_s + 8)
        fps = timescale / delta if delta else 0.0

    # stsz: per-sample sizes (or constant sample_size)
    stsz_s, _ = _find(buf, b"stsz", s, e)
    const_size, n_samples = struct.unpack_from(">II", buf, stsz_s + 4)
    if const_size:
        sizes = [const_size] * n_samples
    else:
        sizes = list(
            struct.unpack_from(f">{n_samples}I", buf, stsz_s + 12)
        )

    # stco / co64: chunk offsets
    try:
        stco_s, _ = _find(buf, b"stco", s, e)
        (n_chunks,) = struct.unpack_from(">I", buf, stco_s + 4)
        chunk_offs = list(
            struct.unpack_from(f">{n_chunks}I", buf, stco_s + 8)
        )
    except ValueError:
        co64_s, _ = _find(buf, b"co64", s, e)
        (n_chunks,) = struct.unpack_from(">I", buf, co64_s + 4)
        chunk_offs = list(
            struct.unpack_from(f">{n_chunks}Q", buf, co64_s + 8)
        )

    # stsc: (first_chunk, samples_per_chunk, desc_idx) runs -> absolute
    # per-sample offsets. One O(n) pass; thereafter every seek is O(1).
    stsc_s, _ = _find(buf, b"stsc", s, e)
    (n_sc,) = struct.unpack_from(">I", buf, stsc_s + 4)
    sc = [
        struct.unpack_from(">III", buf, stsc_s + 8 + 12 * i)
        for i in range(n_sc)
    ]
    offsets: list[int] = []
    sample = 0
    for run, (first_chunk, per_chunk, _desc) in enumerate(sc):
        last_chunk = (
            sc[run + 1][0] - 1 if run + 1 < len(sc) else n_chunks
        )
        for chunk in range(first_chunk, last_chunk + 1):
            pos = chunk_offs[chunk - 1]
            for _ in range(per_chunk):
                if sample >= n_samples:
                    break
                offsets.append(pos)
                pos += sizes[sample]
                sample += 1
    if sample != n_samples:
        raise ValueError(
            f"stsc/stsz mismatch: mapped {sample} of {n_samples} samples"
        )
    return Mp4Track(
        width=int(width),
        height=int(height),
        n_samples=int(n_samples),
        fps=float(fps),
        timescale=int(timescale),
        codec=codec,
        offsets=offsets,
        sizes=sizes,
    )


def sample_bytes(buf, track: Mp4Track, idx: int) -> bytes:
    a, b = track.sample_range(idx)
    return bytes(buf[a:b])


# ---------------------------------------------------------------------------
# Muxer — spec-shaped Motion-JPEG (one JFIF image per sample)
# ---------------------------------------------------------------------------


def _visual_sample_entry(fourcc: bytes, w: int, h: int) -> bytes:
    name = b"overmatch mjpeg"
    compressor = bytes([len(name)]) + name + b"\x00" * (31 - len(name))
    payload = (
        b"\x00" * 6  # reserved
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4  # reserved
        + struct.pack(">H", 1)  # frame_count
        + compressor
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    return _box(fourcc, payload)


def mux_mjpeg(
    samples: list[bytes],
    w: int,
    h: int,
    fps: int = 30,
    samples_per_chunk: int = 0,
) -> bytes:
    """Assemble JFIF-encoded frames into a playable-shape MP4
    (ftyp + mdat + moov with full sample tables). ``samples_per_chunk``
    0 means one single chunk; a positive value splits `mdat` into
    multiple chunks so the stsc/stco resolution path is exercised."""
    if not samples:
        raise ValueError("empty sample list")
    n = len(samples)
    per_chunk = n if samples_per_chunk <= 0 else samples_per_chunk

    for s in samples:
        if len(s) > 0xFFFFFFFF:
            raise ValueError("stsz sample size is 32-bit; frame too large")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    # chunk layout inside mdat (contiguous; chunk boundaries are purely
    # a table-level grouping); the mdat header is 16 bytes in the
    # largesize form, so derive it from the emitted box, not _FULL
    n_chunks = (n + per_chunk - 1) // per_chunk
    first_sample_off = len(ftyp) + (len(mdat) - len(mdat_payload))
    chunk_offs, pos, i = [], first_sample_off, 0
    for _ in range(n_chunks):
        chunk_offs.append(pos)
        for _ in range(min(per_chunk, n - i)):
            pos += len(samples[i])
            i += 1

    timescale = max(int(fps), 1)
    mvhd = _full_box(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, n)
        + struct.pack(">iH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _full_box(
        b"tkhd",
        0,
        3,  # enabled + in-movie
        struct.pack(">IIIII", 0, 0, 1, 0, n)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full_box(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, n)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full_box(
        b"hdlr", 0, 0,
        b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full_box(
        b"dref", 0, 0,
        struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b""),
    )
    dinf = _box(b"dinf", dref)
    stsd = _full_box(
        b"stsd", 0, 0,
        struct.pack(">I", 1) + _visual_sample_entry(_MJPEG_FOURCC, w, h),
    )
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    # stsc runs: all-but-last chunks carry per_chunk samples; a
    # non-dividing tail chunk gets its own run (spec: a run claims
    # every chunk from first_chunk until the next run starts)
    tail = n - per_chunk * (n_chunks - 1)
    sc_runs = [(1, per_chunk, 1)]
    if n_chunks > 1 and tail != per_chunk:
        sc_runs.append((n_chunks, tail, 1))
    stsc = _full_box(
        b"stsc", 0, 0,
        struct.pack(">I", len(sc_runs))
        + b"".join(struct.pack(">III", *r) for r in sc_runs),
    )
    stsz = _full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + struct.pack(f">{n}I", *(len(s) for s in samples)),
    )
    # co64 once any chunk offset overflows 32 bits (>= 4 GiB of
    # samples) — the writer half of the demuxer's co64 branch
    if chunk_offs and max(chunk_offs) > _STCO_MAX:
        stco = _full_box(
            b"co64", 0, 0,
            struct.pack(">I", n_chunks)
            + struct.pack(f">{n_chunks}Q", *chunk_offs),
        )
    else:
        stco = _full_box(
            b"stco", 0, 0,
            struct.pack(">I", n_chunks)
            + struct.pack(f">{n_chunks}I", *chunk_offs),
        )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
