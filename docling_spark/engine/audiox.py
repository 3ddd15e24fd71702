"""Audio/video container probe: payload bytes → technical metadata.

Re-expresses the *deterministic* half of the reference's ASR path: format
routing (docling/datamodel/base_models.py:176-257 audio/video MIME rows,
docling/pipeline/asr_transcriber.py ``_AUDIO_SUFFIX_TO_MIMETYPE``) and the
stream probing the reference delegates to ffmpeg
(asr_transcriber.py ``MISSING_FFMPEG_MESSAGE`` — ffmpeg decodes; whisper
transcribes). Neither ffmpeg nor an ASR model exists in this container,
so *transcription* stays honestly stubbed (operators/multimodal.py);
this module makes the container/duration/sample-rate probe **real** —
a from-scratch pure-Python header parse of every container in the
reference's own audio test corpus (tests/data/audio/sources/: wav, flac,
ogg, mp3, aac/adts, m4a/mp4, mov, avi), same philosophy as the PIL-free
image header parse in ``imagex.py``.

All parsers are defensive: malformed payloads return ``None`` fields,
never raise (failure containment mirrors base_pipeline.py:84-94).
"""

from __future__ import annotations

import struct

__all__ = ["sniff_media", "probe_media"]

# 4-bit ADTS/MP4 sampling-frequency index (ISO/IEC 14496-3 table 1.18)
_AAC_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
              16000, 12000, 11025, 8000, 7350, 0, 0, 0)

# MPEG audio (mp3) tables: bitrate kbps by [version-group][index], layer III
_MP3_BITRATE_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                   224, 256, 320, 0)
_MP3_BITRATE_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
                   128, 144, 160, 0)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}  # version bits → rates by index


def sniff_media(data: bytes) -> str | None:
    """Magic-byte container detection for audio/video payloads."""
    if len(data) < 12:
        return None
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:4] == b"OggS":
        return "ogg"
    if data[4:8] == b"ftyp":
        major = data[8:12]
        if major[:2] == b"qt":
            return "mov"
        return "mp4"
    if data[:3] == b"ID3":
        return "mp3"
    if data[0] == 0xFF and (data[1] & 0xF6) == 0xF0:
        return "aac"  # ADTS sync: 0xFFF + layer 00
    if data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
        return "mp3"
    return None


def _probe_wav(d: bytes) -> dict:
    out: dict = {"codec": "pcm"}
    pos, n = 12, len(d)
    byte_rate = data_size = None
    while pos + 8 <= n:
        cid = d[pos:pos + 4]
        size = struct.unpack_from("<I", d, pos + 4)[0]
        if cid == b"fmt " and pos + 24 <= n:
            fmt_tag, channels, rate, brate = struct.unpack_from(
                "<HHII", d, pos + 8)
            out["channels"] = channels
            out["sample_rate"] = rate
            byte_rate = brate or None
            if pos + 24 <= n and size >= 16:
                out["bits"] = struct.unpack_from("<H", d, pos + 22)[0]
            if fmt_tag != 1:
                out["codec"] = f"wave-fmt-{fmt_tag}"
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if byte_rate and data_size is not None:
        out["duration_s"] = data_size / byte_rate
    return out


def _probe_flac(d: bytes) -> dict:
    # fLaC, then metadata blocks: [last<<7|type, len:3]; type 0 STREAMINFO
    if len(d) < 42 or d[4] & 0x7F != 0:
        return {}
    si = d[8:42]
    rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    channels = ((si[12] >> 1) & 0x07) + 1
    bits = (((si[12] & 0x01) << 4) | (si[13] >> 4)) + 1
    total = ((si[13] & 0x0F) << 32) | struct.unpack_from(">I", si, 14)[0]
    out = {"codec": "flac", "sample_rate": rate or None,
           "channels": channels, "bits": bits}
    if rate and total:
        out["duration_s"] = total / rate
    return out


def _probe_ogg(d: bytes) -> dict:
    out: dict = {}
    rate = None
    pre_skip = 0
    # id header lives in the first page's first packet
    head = d[:512]
    v = head.find(b"\x01vorbis")
    if v >= 0 and v + 16 <= len(head):
        out["codec"] = "vorbis"
        out["channels"] = head[v + 11]
        rate = struct.unpack_from("<I", head, v + 12)[0]
        out["sample_rate"] = rate
    else:
        o = head.find(b"OpusHead")
        if o >= 0 and o + 16 <= len(head):
            out["codec"] = "opus"
            out["channels"] = head[o + 9]
            pre_skip = struct.unpack_from("<H", head, o + 10)[0]
            out["sample_rate"] = struct.unpack_from("<I", head, o + 12)[0]
            rate = 48000  # opus granule positions are always 48 kHz
    # duration from the last page's granule position
    last = d.rfind(b"OggS")
    if rate and last >= 0 and last + 14 <= len(d):
        granule = struct.unpack_from("<q", d, last + 6)[0]
        if granule > 0:
            out["duration_s"] = max(granule - pre_skip, 0) / rate
    return out


def _probe_mp3(d: bytes) -> dict:
    pos = 0
    if d[:3] == b"ID3" and len(d) >= 10:
        size = ((d[6] & 0x7F) << 21) | ((d[7] & 0x7F) << 14) \
            | ((d[8] & 0x7F) << 7) | (d[9] & 0x7F)
        pos = 10 + size
    n = len(d)
    frames = 0
    samples = 0
    rate = channels = None
    while pos + 4 <= n:
        if d[pos] != 0xFF or (d[pos + 1] & 0xE0) != 0xE0:
            pos += 1  # resync (junk between tags and first frame)
            continue
        ver = (d[pos + 1] >> 3) & 0x03      # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (d[pos + 1] >> 1) & 0x03    # 1 = layer III
        if ver == 1 or layer != 1:
            pos += 1
            continue
        bi = (d[pos + 2] >> 4) & 0x0F
        ri = (d[pos + 2] >> 2) & 0x03
        pad = (d[pos + 2] >> 1) & 0x01
        if ri == 3 or bi in (0, 15):
            pos += 1
            continue
        rates = _MP3_RATES[ver]
        rate = rates[ri]
        kbps = (_MP3_BITRATE_V1 if ver == 3 else _MP3_BITRATE_V2)[bi]
        spf = 1152 if ver == 3 else 576
        flen = spf // 8 * kbps * 1000 // rate + pad
        if flen <= 0:
            break
        mode = (d[pos + 3] >> 6) & 0x03
        channels = 1 if mode == 3 else 2
        frames += 1
        samples += spf
        pos += flen
    out: dict = {"codec": "mp3"}
    if rate:
        out["sample_rate"] = rate
        out["channels"] = channels
        out["duration_s"] = samples / rate
        out["n_frames"] = frames
    return out


def _probe_aac(d: bytes) -> dict:
    pos, n = 0, len(d)
    frames = 0
    rate = channels = None
    while pos + 7 <= n:
        if d[pos] != 0xFF or (d[pos + 1] & 0xF6) != 0xF0:
            pos += 1
            continue
        ri = (d[pos + 2] >> 2) & 0x0F
        rate = _AAC_RATES[ri] or rate
        channels = ((d[pos + 2] & 0x01) << 2) | (d[pos + 3] >> 6) or channels
        flen = ((d[pos + 3] & 0x03) << 11) | (d[pos + 4] << 3) \
            | (d[pos + 5] >> 5)
        if flen < 7:
            break
        frames += 1
        pos += flen
    out: dict = {"codec": "aac"}
    if rate and frames:
        out["sample_rate"] = rate
        out["channels"] = channels
        out["duration_s"] = frames * 1024 / rate
        out["n_frames"] = frames
    return out


def _walk_boxes(d: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", d, pos)[0]
        btype = d[pos + 4:pos + 8]
        hdr = 8
        if size == 1 and pos + 16 <= end:  # 64-bit largesize
            size = struct.unpack_from(">Q", d, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr:
            return
        yield btype, pos + hdr, min(pos + size, end)
        pos += size


def _probe_mp4(d: bytes) -> dict:
    out: dict = {}
    for btype, s, e in _walk_boxes(d, 0, len(d)):
        if btype != b"moov":
            continue
        for b2, s2, e2 in _walk_boxes(d, s, e):
            if b2 != b"mvhd" or e2 - s2 < 20:
                continue
            ver = d[s2]
            if ver == 1 and e2 - s2 >= 28:
                ts = struct.unpack_from(">I", d, s2 + 20)[0]
                dur = struct.unpack_from(">Q", d, s2 + 24)[0]
            else:
                ts, dur = struct.unpack_from(">II", d, s2 + 12)
            if ts:
                out["duration_s"] = dur / ts
                out["sample_rate"] = ts if ts > 1000 else None
        # audio sample description: mp4a box carries channels + rate
        a = d.find(b"mp4a", s, e)
        if a >= 0 and a + 36 <= e:
            out["codec"] = "aac"
            out["channels"] = struct.unpack_from(">H", d, a + 20)[0] or None
            rate = struct.unpack_from(">I", d, a + 28)[0] >> 16
            if rate:
                out["sample_rate"] = rate
    return out


def _probe_avi(d: bytes) -> dict:
    out: dict = {"codec": "avi"}
    a = d.find(b"avih")
    if a >= 0 and a + 24 <= len(d):
        usec_pf = struct.unpack_from("<I", d, a + 8)[0]
        total = struct.unpack_from("<I", d, a + 24)[0]
        if usec_pf and total:
            out["duration_s"] = usec_pf * total / 1e6
            out["n_frames"] = total
    return out


_PROBES = {
    "wav": _probe_wav, "flac": _probe_flac, "ogg": _probe_ogg,
    "mp3": _probe_mp3, "aac": _probe_aac, "mp4": _probe_mp4,
    "mov": _probe_mp4, "avi": _probe_avi,
}


def probe_media(data: bytes) -> dict:
    """Container + stream metadata for an audio/video payload.

    Returns ``{container, codec, duration_s, sample_rate, channels,
    bits, n_frames}`` with ``None`` for anything the container doesn't
    carry or a malformed payload hides. Never raises.
    """
    base = {"container": None, "codec": None, "duration_s": None,
            "sample_rate": None, "channels": None, "bits": None,
            "n_frames": None}
    container = sniff_media(data)
    if container is None:
        return base
    base["container"] = container
    try:
        base.update(_PROBES[container](data))
    except Exception:
        pass  # defensive: partial fields already set stay
    return base
