"""Compressed-DICOM frame codecs: JPEG-Lossless (SOF3) and RLE.

Decode path for the transfer syntaxes hospitals predominantly send —
JPEG Lossless SV1 (1.2.840.10008.1.2.4.70), JPEG Lossless P14
(…4.57), and RLE Lossless (…1.2.5) — which the reference reads through
SimpleITK/GDCM (`body_organ_analysis/compute/io.py:326-383`). The hot
decoder lives in C++ (`native/jpegll.cpp`, ctypes); pure-python
fallbacks keep the codecs working without a toolchain. Encoders (pure
python) exist so tests can round-trip synthetic encapsulated series and
the writer can emit compressed files.
"""

from __future__ import annotations

import struct

import numpy as np

from boa_tpu import native


# ---------------------------------------------------------------------------
# native bindings
# ---------------------------------------------------------------------------

def _native_lib():
    import ctypes

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "boa_jpegll_decode"):
        return None
    if not getattr(lib, "_jpegll_bound", False):
        lib.boa_jpegll_decode.restype = ctypes.c_int32
        lib.boa_jpegll_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64] + [ctypes.POINTER(ctypes.c_int32)] * 4
        lib.boa_rle_decode.restype = ctypes.c_int32
        lib.boa_rle_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32]
        lib._jpegll_bound = True
    return lib


# ---------------------------------------------------------------------------
# JPEG lossless decode
# ---------------------------------------------------------------------------

def decode_jpeg_lossless(frame: bytes) -> np.ndarray:
    """(rows, cols) or (rows, cols, ncomp) uint16 samples."""
    lib = _native_lib()
    if lib is not None:
        return _decode_jpegll_native(lib, frame)
    return _decode_jpegll_python(frame)


def _decode_jpegll_native(lib, frame: bytes) -> np.ndarray:
    import ctypes

    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    ncomp = ctypes.c_int32()
    prec = ctypes.c_int32()
    rc = lib.boa_jpegll_decode(frame, len(frame), None, 0,
                               ctypes.byref(rows), ctypes.byref(cols),
                               ctypes.byref(ncomp), ctypes.byref(prec))
    if rc != 0:
        raise ValueError(f"JPEG-lossless geometry parse failed (rc={rc})")
    out = np.empty(rows.value * cols.value * ncomp.value, np.uint16)
    rc = lib.boa_jpegll_decode(frame, len(frame),
                               out.ctypes.data_as(ctypes.c_void_p), out.size,
                               ctypes.byref(rows), ctypes.byref(cols),
                               ctypes.byref(ncomp), ctypes.byref(prec))
    if rc != 0:
        raise ValueError(f"JPEG-lossless decode failed (rc={rc})")
    out = out.reshape(rows.value, cols.value, ncomp.value)
    return out[:, :, 0] if ncomp.value == 1 else out


class _Bits:
    """MSB-first bit reader with JPEG 0xFF00 byte unstuffing."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            self.pos += 1  # skip stuffed 0x00 (markers end the scan)
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v


def _decode_jpegll_python(frame: bytes) -> np.ndarray:
    """Reference fallback decoder (slow); single/multi-component, 1x1."""
    pos = 2  # past SOI
    tables: dict[int, tuple[list[int], list[int], list[int], list[int]]] = {}
    precision = rows = cols = 0
    comp_ids: list[int] = []
    comp_dc: dict[int, int] = {}
    while pos < len(frame):
        assert frame[pos] == 0xFF, "marker expected"
        marker = frame[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        seg = struct.unpack(">H", frame[pos:pos + 2])[0]
        body = frame[pos + 2:pos + seg]
        if marker in (0xC3, 0xC7, 0xCB, 0xCF):  # SOF3 family
            precision = body[0]
            rows, cols = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comp_ids = [body[6 + 3 * c] for c in range(ncomp)]
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                th = body[off] & 15
                counts = list(body[off + 1:off + 17])
                nv = sum(counts)
                vals = list(body[off + 17:off + 17 + nv])
                mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
                code = k = 0
                for ln in range(1, 17):
                    valptr[ln] = k
                    mincode[ln] = code
                    code += counts[ln - 1]
                    k += counts[ln - 1]
                    maxcode[ln] = code - 1 if counts[ln - 1] else -1
                    code <<= 1
                tables[th] = (mincode, maxcode, valptr, vals)
                off += 17 + nv
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cid = body[1 + 2 * c]
                scan.append(comp_ids.index(cid))
                comp_dc[comp_ids.index(cid)] = body[2 + 2 * c] >> 4
            predictor = body[1 + 2 * ns]
            pt = body[3 + 2 * ns] & 15
            data = frame[pos + seg:]
            return _jpegll_scan(data, rows, cols, len(comp_ids), scan,
                                comp_dc, tables, precision, predictor, pt)
        pos += seg
    raise ValueError("no SOS marker in JPEG stream")


def _jpegll_scan(data, rows, cols, ncomp, scan, comp_dc, tables, precision,
                 predictor, pt) -> np.ndarray:
    br = _Bits(data)

    def huff(th):
        mincode, maxcode, valptr, vals = tables[th]
        code = br.read(1)
        for ln in range(1, 17):
            if maxcode[ln] >= 0 and code <= maxcode[ln]:
                return vals[valptr[ln] + code - mincode[ln]]
            code = (code << 1) | br.read(1)
        raise ValueError("bad huffman code")

    out = np.zeros((rows, cols, ncomp), np.uint16)
    default = 1 << (precision - pt - 1)
    for y in range(rows):
        for x in range(cols):
            for c in scan:
                ssss = huff(comp_dc[c])
                if ssss == 16:
                    diff = 32768
                else:
                    v = br.read(ssss) if ssss else 0
                    diff = v if ssss == 0 or v >= (1 << (ssss - 1)) else \
                        v - (1 << ssss) + 1
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = int(out[0, x - 1, c])
                elif x == 0:
                    pred = int(out[y - 1, 0, c])
                else:
                    ra = int(out[y, x - 1, c])
                    rb = int(out[y - 1, x, c])
                    rc_ = int(out[y - 1, x - 1, c])
                    pred = {1: ra, 2: rb, 3: rc_, 4: ra + rb - rc_,
                            5: ra + ((rb - rc_) >> 1),
                            6: rb + ((ra - rc_) >> 1),
                            7: (ra + rb) >> 1}[predictor]
                out[y, x, c] = ((pred + diff) & 0xFFFF) << pt
    return out[:, :, 0] if ncomp == 1 else out


# ---------------------------------------------------------------------------
# JPEG lossless encode (SV1: predictor 1, Pt 0) — pure python
# ---------------------------------------------------------------------------

#: fixed valid Huffman lengths for the 17 SSSS symbols: three 2-bit codes,
#: then one code per length 3..16 (Kraft sum 1 - 2^-16: all-ones unused)
_ENC_COUNTS = [0, 3] + [1] * 14
_ENC_SYMBOLS = list(range(17))


def _enc_table() -> dict[int, tuple[int, int]]:
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(_ENC_COUNTS[ln - 1]):
            table[_ENC_SYMBOLS[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return table


def encode_jpeg_lossless_sv1(img: np.ndarray, precision: int = 16) -> bytes:
    """Encode a 2-D unsigned array as JPEG lossless, SV1 (Ra predictor)."""
    img = np.ascontiguousarray(img, np.uint16)
    rows, cols = img.shape
    table = _enc_table()

    # differences: (0,0) vs 2^(P-1); first row vs Ra; first col vs Rb;
    # rest vs Ra (selection value 1)
    work = img.astype(np.int32)
    diffs = np.empty_like(work)
    diffs[0, 0] = work[0, 0] - (1 << (precision - 1))
    diffs[0, 1:] = work[0, 1:] - work[0, :-1]
    diffs[1:, 0] = work[1:, 0] - work[:-1, 0]
    diffs[1:, 1:] = work[1:, 1:] - work[1:, :-1]
    diffs = ((diffs + 32768) & 0xFFFF) - 32768  # mod-2^16 wraparound

    bits = bytearray()
    acc = 0
    nbits = 0

    def put(value: int, length: int) -> None:
        nonlocal acc, nbits
        acc = (acc << length) | (value & ((1 << length) - 1))
        nbits += length
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            bits.append(byte)
            if byte == 0xFF:
                bits.append(0x00)
        acc &= (1 << nbits) - 1

    for diff in diffs.ravel():
        d = int(diff)
        if d == 32768 or d == -32768:
            code, ln = table[16]
            put(code, ln)
            continue
        mag = abs(d)
        ssss = mag.bit_length()
        code, ln = table[ssss]
        put(code, ln)
        if ssss:
            put(d if d >= 0 else d + (1 << ssss) - 1, ssss)
    if nbits:
        put((1 << (8 - nbits)) - 1, 8 - nbits)  # pad with 1s

    dht_vals = bytes([0x00] + _ENC_COUNTS + _ENC_SYMBOLS)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht_vals)) + dht_vals
    sof = struct.pack(">BHHB", precision, rows, cols, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    sos = bytes([1, 1, 0x00, 1, 0, 0x00])  # 1 comp, Ss=1 (SV1), Al=0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bits
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# DICOM RLE (PS3.5 Annex G)
# ---------------------------------------------------------------------------

def decode_rle(frame: bytes, rows: int, cols: int,
               bytes_per_sample: int) -> np.ndarray:
    """Recompose an RLE frame into (rows, cols) little-endian samples."""
    npix = rows * cols
    lib = _native_lib()
    if lib is not None:
        import ctypes

        out = np.empty(npix * bytes_per_sample, np.uint8)
        rc = lib.boa_rle_decode(frame, len(frame),
                                out.ctypes.data_as(ctypes.c_void_p),
                                npix, bytes_per_sample)
        if rc == 0:
            dt = {1: np.uint8, 2: np.uint16}[bytes_per_sample]
            return out.view(dt).reshape(rows, cols)
        raise ValueError(f"RLE decode failed (rc={rc})")
    return _decode_rle_python(frame, rows, cols, bytes_per_sample)


def _packbits_decode(seg: bytes, expect: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(seg) and len(out) < expect:
        n = struct.unpack_from("b", seg, pos)[0]
        pos += 1
        if n >= 0:
            out += seg[pos:pos + n + 1]
            pos += n + 1
        elif n != -128:
            out += seg[pos:pos + 1] * (1 - n)
            pos += 1
    if len(out) < expect:
        raise ValueError("RLE segment shorter than expected")
    return bytes(out[:expect])


def _decode_rle_python(frame, rows, cols, bytes_per_sample) -> np.ndarray:
    header = struct.unpack("<16I", frame[:64])
    nseg = header[0]
    if nseg != bytes_per_sample:
        raise ValueError(f"RLE segments {nseg} != bytes/sample "
                         f"{bytes_per_sample}")
    npix = rows * cols
    planes = []
    for s in range(nseg):
        start = header[1 + s]
        end = header[2 + s] if s + 1 < nseg else len(frame)
        planes.append(np.frombuffer(
            _packbits_decode(frame[start:end], npix), np.uint8))
    # segment 0 = MSB plane; compose little-endian
    out = np.zeros(npix, np.uint16 if bytes_per_sample == 2 else np.uint8)
    for s, plane in enumerate(planes):
        shift = 8 * (bytes_per_sample - 1 - s)
        out |= plane.astype(out.dtype) << shift
    return out.reshape(rows, cols)


def _packbits_encode(plane: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(plane)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and plane[i + run] == plane[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)  # -(run-1) as unsigned byte
            out.append(plane[i])
            i += run
            continue
        # literal stretch: until a run of >=3 starts (2-byte runs are not
        # worth breaking a literal for)
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while i + run < n and run < 3 and plane[i + run] == plane[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out.append(i - lit - 1)
        out += plane[lit:i]
    if len(out) % 2:
        out.append(0)  # segments must be even-length
    return bytes(out)


def encode_rle(img: np.ndarray) -> bytes:
    """Encode (rows, cols) uint8/uint16 samples as one RLE frame."""
    img = np.ascontiguousarray(img)
    bps = img.dtype.itemsize
    if bps > 2:
        raise ValueError("RLE encoder supports 1- or 2-byte samples")
    flat = img.view(np.uint8).reshape(-1, bps)
    segments = []
    for s in range(bps):
        plane = flat[:, bps - 1 - s].tobytes()  # MSB plane first
        segments.append(_packbits_encode(plane))
    header = [len(segments)]
    off = 64
    for seg in segments:
        header.append(off)
        off += len(seg)
    header += [0] * (16 - len(header))
    body = struct.pack("<16I", *header) + b"".join(segments)
    return body + (b"\x00" if len(body) % 2 else b"")
