"""Pure-stdlib baseline JPEG codec (struct + numpy) — the second REAL
decode path for the multimodal operators, next to functions/png.py.

Decoder: baseline sequential DCT (SOF0) with arbitrary quantization /
Huffman tables, any component sampling factors (4:4:4, 4:2:0, 4:2:2,
grayscale), restart markers, byte-stuffing — i.e. the profile ~all
web JPEGs below progressive use. Progressive (SOF2), arithmetic coding
and 12-bit precision raise NotImplementedError honestly.

Encoder: baseline 4:4:4 (or single-component grayscale) with flat
quantization tables and self-built canonical Huffman tables derived
from the image's own symbol set (every used symbol at one code length
— spec-valid DHT, deliberately simple rather than Annex-K-optimal; the
point is a bit-exact spec-conformant stream our decoder AND any other
baseline decoder can read, giving the tests a self-contained
encode→decode roundtrip without binary fixtures).

All block math (FDCT/IDCT, quantization, upsampling, colorspace) is
vectorized numpy over (n_blocks, 8, 8) stacks; only the entropy coding
walks bits in Python — fine at the Arrow-batch image sizes the
multimodal operators feed it.

No reference analog — qwatch has no media path; this covers the
training-data brief's multimodal-column requirement.
"""

from __future__ import annotations

import struct

import numpy as np

# orthonormal 8x8 DCT-II matrix: block_dct = D @ block @ D.T
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

# within an anti-diagonal d = r+c: odd d walks DOWN (row ascending),
# even d walks UP (row descending, i.e. col ascending)
_ZIGZAG = np.array(
    sorted(
        range(64),
        key=lambda i: (
            (i // 8 + i % 8),
            (i // 8 if (i // 8 + i % 8) % 2 else i % 8),
        ),
    )
)  # index k of zigzag order -> flat (row*8+col) position
_UNZIGZAG = np.argsort(_ZIGZAG)

_QL = np.full(64, 10, dtype=np.int64)  # flat luma table (DC gentler)
_QL[0] = 8
_QC = np.full(64, 20, dtype=np.int64)
_QC[0] = 12


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + offset bits for a DC diff / AC coeff."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits: int, length: int) -> None:
        self.acc = (self.acc << length) | (bits & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _canonical_codes(counts_by_len: list[int], symbols: list[int]) -> dict:
    """symbol -> (code, length) per the DHT canonical assignment."""
    codes, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts_by_len[length - 1]):
            codes[symbols[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


def _flat_table(symbols: set[int]) -> tuple[list[int], list[int], dict]:
    """A spec-valid DHT giving every used symbol the same code length L
    (2^L > n so the forbidden all-ones code stays unused)."""
    syms = sorted(symbols) or [0]
    length = max(2, (len(syms) + 1).bit_length())
    counts = [0] * 16
    counts[length - 1] = len(syms)
    return counts, syms, _canonical_codes(counts, syms)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(h, w) -> (n_blocks, 8, 8) stack, row-major block order; edges
    replicated to a multiple of 8."""
    h, w = plane.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    return (
        padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_plane(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize every 8x8 block → zigzagged coefficient stack in
    row-major block order."""
    blocks = _blockify(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
    return np.round(coef.reshape(-1, 64)[:, _ZIGZAG] / q).astype(np.int64)


def _symbols_for(seq: np.ndarray) -> tuple[set[int], set[int]]:
    """DC/AC Huffman symbols the writer will emit for `seq` — MUST walk
    the same block order as the write (DC diffs chain across it)."""
    dc_syms, ac_syms = set(), set()
    prev = 0
    for row in seq:
        size, _ = _magnitude(int(row[0]) - prev)
        prev = int(row[0])
        dc_syms.add(size)
        run = 0
        for v in row[1:]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.add(0xF0)
                run -= 16
            size, _ = _magnitude(int(v))
            ac_syms.add((run << 4) | size)
            run = 0
        if run:
            ac_syms.add(0x00)  # EOB
    return dc_syms, ac_syms


def _write_blocks(
    w: _BitWriter, zz: np.ndarray, dc_codes: dict, ac_codes: dict, prev_dc: int
) -> int:
    for row in zz:
        size, bits = _magnitude(int(row[0]) - prev_dc)
        prev_dc = int(row[0])
        code, length = dc_codes[size]
        w.put(code, length)
        if size:
            w.put(bits, size)
        run = 0
        for v in row[1:]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]
                w.put(code, length)
                run -= 16
            size, bits = _magnitude(int(v))
            code, length = ac_codes[(run << 4) | size]
            w.put(code, length)
            w.put(bits, size)
            run = 0
        if run:
            code, length = ac_codes[0x00]
            w.put(code, length)
    return prev_dc


def encode_jpeg(pixels: np.ndarray, subsample: bool = False) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline JFIF
    JPEG (flat quant tables, self-built Huffman tables). `subsample`
    switches chroma from 4:4:4 to 4:2:0 (2×2 box mean, the dominant web
    layout) — in-sandbox this is also what exercises the decoder's
    generalized MCU interleave + upsampling path, since no independent
    encoder exists here to produce such streams."""
    a = np.asarray(pixels, dtype=np.uint8)
    h, w = a.shape[:2]
    if a.ndim == 2:
        planes = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError(f"unsupported pixel shape {a.shape}")
    n_comp = len(planes)
    sub = subsample and n_comp == 3
    if sub:
        # pad to even dims (edge), then 2x2 box-mean the chroma planes
        for i in (1, 2):
            p = np.pad(
                planes[i], ((0, h % 2), (0, w % 2)), mode="edge"
            )
            planes[i] = (
                p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean((1, 3))
            )
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * n_comp
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    qtabs = [_QL] + [_QC] * (n_comp - 1)

    encoded, dims, dc_sets, ac_sets = [], [], [set(), set()], [set(), set()]
    for i, plane in enumerate(planes):
        ch, cv = samp[i]
        # pad each plane so its block grid is exactly (mcuy*cv, mcux*ch)
        H, W = mcuy * cv * 8, mcux * ch * 8
        p = np.clip(plane, 0, 255)
        p = np.pad(
            p, ((0, H - p.shape[0]), (0, W - p.shape[1])), mode="edge"
        )
        zz = _encode_plane(p, qtabs[i])
        encoded.append(zz)
        bw = mcux * ch
        dims.append((mcuy * cv, bw))
        # symbol sets must follow the MCU write order (DC diffs chain
        # across it, which differs from row-major when cv*ch > 1)
        order = [
            (my * cv + by) * bw + (mx * ch + bx)
            for my in range(mcuy)
            for mx in range(mcux)
            for by in range(cv)
            for bx in range(ch)
        ]
        dcs, acs = _symbols_for(zz[order])
        tsel = 0 if i == 0 else 1
        dc_sets[tsel] |= dcs
        ac_sets[tsel] |= acs

    dc_tabs = [_flat_table(s) for s in dc_sets[: 1 if n_comp == 1 else 2]]
    ac_tabs = [_flat_table(s) for s in ac_sets[: 1 if n_comp == 1 else 2]]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qtabs[: 1 if n_comp == 1 else 2]):
        out += seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in q))
    comp_spec = b"".join(
        bytes(
            [cid + 1, (samp[cid][0] << 4) | samp[cid][1], 0 if cid == 0 else 1]
        )
        for cid in range(n_comp)
    )
    out += seg(
        0xFFC0, struct.pack(">BHHB", 8, h, w, n_comp) + comp_spec
    )
    for cls, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for tid, (counts, syms, _codes) in enumerate(tabs):
            out += seg(
                0xFFC4,
                bytes([(cls << 4) | tid]) + bytes(counts) + bytes(syms),
            )
    scan_spec = b"".join(
        bytes([cid + 1, 0 if cid == 0 else 0x11]) for cid in range(n_comp)
    )
    out += seg(0xFFDA, bytes([n_comp]) + scan_spec + b"\x00\x3f\x00")

    writer = _BitWriter()
    prev = [0] * n_comp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(n_comp):
                ch, cv = samp[ci]
                _bh, bw = dims[ci]
                tsel = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        bi = (my * cv + by) * bw + (mx * ch + bx)
                        prev[ci] = _write_blocks(
                            writer,
                            encoded[ci][bi : bi + 1],
                            dc_tabs[tsel][2],
                            ac_tabs[tsel][2],
                            prev[ci],
                        )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-coded segment reader: un-stuffs 0xFF00, stops at markers
    (RSTn are consumed explicitly via restart())."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartHit()
            else:
                raise EOFError("marker inside entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume the RSTn marker at the current byte boundary."""
        self.acc = 0
        self.n = 0
        while self.buf[self.pos] != 0xFF or not (
            0xD0 <= self.buf[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


class _RestartHit(Exception):
    pass


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def jpeg_header(payload: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_components) from the first SOF marker, or None
    if the payload is not a JPEG."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    try:
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            ln = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                _prec, h, w, n = struct.unpack(
                    ">BHHB", payload[pos + 4 : pos + 10]
                )
                return w, h, n
            pos += 2 + ln
    except (struct.error, IndexError):
        return None
    return None


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 pixels — (h, w) for grayscale,
    (h, w, 3) RGB otherwise. NotImplementedError for progressive /
    arithmetic / 12-bit streams, ValueError for malformed data."""
    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> {(code,len): sym}
    frame = None
    restart_interval = 0
    pos = 2
    while True:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        ln = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                qtabs[tq] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                counts = list(body[i + 1 : i + 17])
                nsym = sum(counts)
                syms = list(body[i + 17 : i + 17 + nsym])
                codes = _canonical_codes(counts, syms)
                huff[(tc, th)] = {
                    (code, length): s for s, (code, length) in codes.items()
                }
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, n = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for ci in range(n):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("progressive/extended JPEG")
        elif marker in (0xCD, 0xCE, 0xCF):
            raise NotImplementedError("arithmetic-coded JPEG")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_sel = {}
            for si in range(ns):
                cs, tsel = body[1 + si * 2], body[2 + si * 2]
                scan_sel[cs] = (tsel >> 4, tsel & 0xF)
            data_start = pos + 2 + ln
            return _decode_scan(
                payload, data_start, frame, scan_sel, qtabs, huff,
                restart_interval,
            )
        pos += 2 + ln


def _decode_scan(
    buf, pos, frame, scan_sel, qtabs, huff, restart_interval
) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        c["dc"] = 0
    reader = _BitReader(buf, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                for c in comps:
                    c["dc"] = 0
            try:
                for c in comps:
                    dc_t, ac_t = scan_sel[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block = np.zeros(64, dtype=np.int64)
                            s = _huff_decode(reader, huff[(0, dc_t)])
                            diff = _extend(reader.bits(s), s)
                            c["dc"] += diff
                            block[0] = c["dc"]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(reader, huff[(1, ac_t)])
                                if rs == 0x00:
                                    break
                                if rs == 0xF0:
                                    k += 16
                                    continue
                                k += rs >> 4
                                size = rs & 0xF
                                if k > 63:
                                    raise ValueError("AC index overflow")
                                block[k] = _extend(reader.bits(size), size)
                                k += 1
                            idx = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                            c["coef"][idx] = block
            except _RestartHit as e:  # pragma: no cover - defensive
                raise ValueError("unexpected restart marker") from e
            mcu_count += 1

    planes = []
    for c in comps:
        q = qtabs[c["tq"]]
        deq = (c["coef"] * q)[:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ji,njk,kl->nil", _D, deq, _D) + 128.0
        bh, bw = c["bh"], c["bw"]
        plane = (
            spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution (sample replication)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
