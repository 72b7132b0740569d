"""Minimal real ISO-BMFF (MP4) container parser, stdlib only.

The video leg of the multimodal seam, at the honestly-implementable
level: a training-data pipeline's frame-sampling plan needs the
CONTAINER structure — how many samples a track has, where each sample's
bytes live in mdat, the presentation dims and duration — and none of
that requires a video codec. This module walks the box tree (size+type
headers, 64-bit largesize, nesting), validates ftyp, reads mvhd
(timescale/duration, version 0 and 1) and tkhd (16.16 fixed-point
width/height), and demuxes the samples out of mdat by driving the
sample table exactly as a demuxer does: stsz gives per-sample sizes,
stco (or co64) the chunk offset, stts the sample count cross-check.

What stays behind the external-codec seam: decoding the demuxed sample
BYTES into pixels (H.264/H.265/AV1 need libav/pyav). The demuxed frames
here are opaque byte strings; the fixtures fill them with a closed-form
integer pattern so the DuckDB oracle can regenerate the demuxed content
(and its checksum) analytically.

Malformed containers raise ValueError (reject-sink route); structurally
valid files using features out of scope (compressed moov, multiple
tracks, multi-chunk sample layouts) raise NotImplementedError at the
same seam as the other codecs.

Reference parity note: the reference repo (suconghou/nginx_log) has no
media path — this is §2.10 training-data extension surface (SURVEY.md),
alongside functions/jpeg.py and the WAV/PPM/PNG codecs.
"""

from __future__ import annotations

import struct


def _walk_children(data: bytes, pos: int, end: int):
    """Yield (box_type, body_start, body_end) for each child box in
    data[pos:end]. Handles size==1 (64-bit largesize) and size==0
    (box extends to the end of the enclosing container)."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize header")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"bad MP4 box size for {btype!r}")
        yield btype, body, pos + size
        pos += size


def _find_one(data: bytes, pos: int, end: int, btype: bytes) -> tuple[int, int]:
    found = [(b, e) for t, b, e in _walk_children(data, pos, end) if t == btype]
    if not found:
        raise ValueError(f"missing {btype!r} box")
    if len(found) > 1:
        raise NotImplementedError(
            f"multiple {btype!r} boxes (multi-track MP4) need an external demuxer"
        )
    return found[0]


def _fullbox(data: bytes, pos: int, end: int) -> tuple[int, int]:
    """Read the FullBox version/flags header; returns (version, body pos)."""
    if pos + 4 > end:
        raise ValueError("truncated MP4 FullBox header")
    return data[pos], pos + 4


def parse_mp4(payload: bytes) -> dict:
    """Parse a single-track ISO-BMFF container. Returns a dict with
    width, height, n_frames (from the sample table), duration_ms (from
    mvhd), and frames (list of demuxed per-sample byte strings sliced
    out of mdat via stsz + stco). ValueError on malformed containers;
    NotImplementedError for out-of-scope layouts."""
    if len(payload) < 16:
        raise ValueError("not an MP4 container (too short)")
    boxes = list(_walk_children(payload, 0, len(payload)))
    types = [t for t, _, _ in boxes]
    if not types or types[0] != b"ftyp":
        raise ValueError("not an MP4 container (missing leading ftyp)")
    if b"moov" not in types or b"mdat" not in types:
        raise ValueError("MP4 missing moov/mdat box")
    ftyp_b, ftyp_e = next((b, e) for t, b, e in boxes if t == b"ftyp")
    if ftyp_e - ftyp_b < 8:
        raise ValueError("truncated ftyp box")
    moov_b, moov_e = _find_one(payload, 0, len(payload), b"moov")
    if any(t == b"cmov" for t, _, _ in _walk_children(payload, moov_b, moov_e)):
        raise NotImplementedError("compressed moov needs an external demuxer")

    # mvhd: movie timescale + duration (version 0: 32-bit, version 1: 64-bit)
    mvhd_b, mvhd_e = _find_one(payload, moov_b, moov_e, b"mvhd")
    ver, p = _fullbox(payload, mvhd_b, mvhd_e)
    # bound every fixed-field read against the ENCLOSING box end, not the
    # whole payload — a box truncated short of its fields (but not of the
    # file) must reject, not silently read the next box's bytes
    if p + (28 if ver == 1 else 16) > mvhd_e:
        raise ValueError("truncated mvhd box: fixed fields overflow the box")
    try:
        if ver == 1:
            _, _, timescale, duration = struct.unpack_from(">QQIQ", payload, p)
        else:
            _, _, timescale, duration = struct.unpack_from(">IIII", payload, p)
    except struct.error as exc:
        raise ValueError(f"truncated mvhd box: {exc}") from exc
    if timescale == 0:
        raise ValueError("mvhd timescale is zero")

    trak_b, trak_e = _find_one(payload, moov_b, moov_e, b"trak")
    tkhd_b, tkhd_e = _find_one(payload, trak_b, trak_e, b"tkhd")
    ver, p = _fullbox(payload, tkhd_b, tkhd_e)
    # tkhd: creation/modification/track_id/reserved/duration, then
    # 2x32 reserved, layer/alt-group/volume/reserved (8), matrix (36),
    # width + height as 16.16 fixed point.
    fixed = p + (32 if ver == 1 else 20) + 8 + 8 + 36
    if fixed + 8 > tkhd_e:
        raise ValueError("truncated tkhd box: fixed fields overflow the box")
    try:
        w_fx, h_fx = struct.unpack_from(">II", payload, fixed)
    except struct.error as exc:
        raise ValueError(f"truncated tkhd box: {exc}") from exc
    width, height = w_fx >> 16, h_fx >> 16
    if width <= 0 or height <= 0:
        raise ValueError(f"bad MP4 track dimensions {width}x{height}")

    mdia_b, mdia_e = _find_one(payload, trak_b, trak_e, b"mdia")
    minf_b, minf_e = _find_one(payload, mdia_b, mdia_e, b"minf")
    stbl_b, stbl_e = _find_one(payload, minf_b, minf_e, b"stbl")

    # stts: total sample count (sum over (count, delta) runs)
    stts_b, stts_e = _find_one(payload, stbl_b, stbl_e, b"stts")
    _, p = _fullbox(payload, stts_b, stts_e)
    try:
        (n_ent,) = struct.unpack_from(">I", payload, p)
        if p + 4 + 8 * n_ent > stts_e:
            raise ValueError("truncated stts box: entries overflow the box")
        stts_total = sum(
            struct.unpack_from(">I", payload, p + 4 + 8 * k)[0]
            for k in range(n_ent)
        )
    except struct.error as exc:
        raise ValueError(f"truncated stts box: {exc}") from exc

    # stsz: per-sample sizes (uniform-size shortcut when sample_size != 0)
    stsz_b, stsz_e = _find_one(payload, stbl_b, stbl_e, b"stsz")
    _, p = _fullbox(payload, stsz_b, stsz_e)
    try:
        if p + 8 > stsz_e:
            raise ValueError("truncated stsz box: fixed fields overflow the box")
        sample_size, n_samples = struct.unpack_from(">II", payload, p)
        # a corrupt count must not cost a multi-GB list on its way to the
        # reject sink: more samples than container bytes is impossible
        if n_samples > len(payload):
            raise ValueError(f"stsz sample count {n_samples} exceeds container size")
        if sample_size != 0:
            sizes = [sample_size] * n_samples
        else:
            if p + 8 + 4 * n_samples > stsz_e:
                raise ValueError("truncated stsz box: entries overflow the box")
            sizes = list(
                struct.unpack_from(f">{n_samples}I", payload, p + 8)
            ) if n_samples else []
    except (struct.error, MemoryError) as exc:
        raise ValueError(f"truncated stsz box: {exc}") from exc
    if stts_total != n_samples:
        raise ValueError(
            f"sample-table mismatch: stts says {stts_total}, stsz says {n_samples}"
        )

    # stco / co64: chunk offsets (single-chunk layout only)
    try:
        try:
            stco_b, stco_e = _find_one(payload, stbl_b, stbl_e, b"stco")
            _, p = _fullbox(payload, stco_b, stco_e)
            (n_chunks,) = struct.unpack_from(">I", payload, p)
            if p + 4 + 4 * n_chunks > stco_e:
                raise ValueError("truncated stco box: entries overflow the box")
            offsets = struct.unpack_from(f">{n_chunks}I", payload, p + 4)
        except ValueError:
            stco_b, stco_e = _find_one(payload, stbl_b, stbl_e, b"co64")
            _, p = _fullbox(payload, stco_b, stco_e)
            (n_chunks,) = struct.unpack_from(">I", payload, p)
            if p + 4 + 8 * n_chunks > stco_e:
                raise ValueError("truncated co64 box: entries overflow the box")
            offsets = struct.unpack_from(f">{n_chunks}Q", payload, p + 4)
    except (struct.error, MemoryError) as exc:
        raise ValueError(f"truncated stco/co64 box: {exc}") from exc
    if n_chunks == 0:
        # samples with no chunk offset is a MALFORMED table, not an
        # unsupported layout — it must route to the reject sink, not the
        # unsupported one
        raise ValueError("empty stco: no chunk offsets for a sample table")
    if n_chunks != 1:
        raise NotImplementedError(
            "multi-chunk sample layouts need an external demuxer; "
            "single-chunk mdat only"
        )

    # demux: slice each sample out of the file by absolute offset
    pos = offsets[0]
    frames = []
    for s in sizes:
        if pos + s > len(payload):
            raise ValueError("sample table points past the end of mdat")
        frames.append(payload[pos : pos + s])
        pos += s
    return {
        "width": width,
        "height": height,
        "n_frames": n_samples,
        "duration_ms": duration * 1000 // timescale,
        "frames": frames,
    }


def encode_mp4(
    frames: list[bytes], width: int, height: int, duration_ms: int
) -> bytes:
    """Build a minimal spec-shaped single-track ISO-BMFF container around
    opaque sample bytes: ftyp(isom) + moov(mvhd + trak(tkhd +
    mdia(minf(stbl(stts + stsz + stco))))) + mdat. stco carries the real
    absolute file offset of the first mdat payload byte, so parse_mp4
    demuxes the exact frames back out. Used to synthesize deterministic
    fixtures; a real muxer would also write mdhd/hdlr/stsd, which
    parse_mp4 deliberately does not require."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    timescale = 1000
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">IIII", 0, 0, timescale, duration_ms)
        + bytes(80),
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + bytes(20)  # creation/modification/track_id/reserved/duration
        + bytes(8)  # reserved
        + bytes(8)  # layer / alternate group / volume / reserved
        + bytes(36)  # identity matrix slot (zeros are fine for parsing)
        + struct.pack(">II", width << 16, height << 16),
    )
    stts = box(
        b"stts", b"\x00\x00\x00\x00" + struct.pack(">III", 1, len(frames), 1)
    )
    stsz = box(
        b"stsz",
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, len(frames))
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco_body = b"\x00\x00\x00\x00" + struct.pack(">II", 1, 0)  # offset patched below
    stbl = box(b"stbl", stts + stsz + box(b"stco", stco_body))
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat = box(b"mdat", mdat_payload)
    out = bytearray(ftyp + moov + mdat)
    # patch the stco entry with the absolute offset of the mdat payload;
    # search only the header prefix (frame bytes could contain the same
    # 12-byte pattern, and rindex over the whole file would patch mdat)
    header_len = len(ftyp) + len(moov)
    stco_entry_pos = bytes(out[:header_len]).rindex(stco_body) + len(stco_body) - 4
    struct.pack_into(">I", out, stco_entry_pos, len(out) - len(mdat_payload))
    return bytes(out)
