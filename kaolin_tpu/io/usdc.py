"""Binary USD (usdc, "crate") file reader.

Self-contained reader for the Pixar crate format (no ``pxr``
dependency), covering the subset the reference's I/O layer exercises —
mesh / pointcloud / voxelgrid prims with default values and time
samples — i.e. everything ``Timelapse`` and the reference test fixtures
(``tests/samples/timelapse/**.usd``) contain. Parsed files are loaded
into the same in-memory :class:`kaolin_tpu.io.usd.Stage` prim tree the
usda parser produces, so every importer works unchanged on binary
files.

Format notes (validated against the reference fixtures, crate version
0.8.0; layout per pxr's ``crateFile.cpp``):

- header: ``PXR-USDC`` magic, u8 version triple, u64 TOC offset.
- TOC sections: TOKENS / STRINGS / FIELDS / FIELDSETS / PATHS / SPECS.
- compression: LZ4 blocks with a 1-byte chunk-count framing; integer
  streams additionally use USD's delta coding (common int32 + 2-bit
  per-value size codes + variable-width deltas, running-summed).
- a ``ValueRep`` is a u64: bit63 array, bit62 inlined, bit61
  compressed, bits 48-55 type enum, low 48 bits payload
  (inline value or file offset).
"""

import struct

import numpy as np

__all__ = ['read_usdc', 'is_usdc']

# crate type enum (crateDataTypes.h order), subset we interpret
_BOOL, _UCHAR, _INT, _UINT, _INT64, _UINT64 = 1, 2, 3, 4, 5, 6
_HALF, _FLOAT, _DOUBLE, _STRING, _TOKEN, _ASSET = 7, 8, 9, 10, 11, 12
_MAT2D, _MAT3D, _MAT4D = 13, 14, 15
_QUATD, _QUATF, _QUATH = 16, 17, 18
_VEC2D, _VEC2F, _VEC2H, _VEC2I = 19, 20, 21, 22
_VEC3D, _VEC3F, _VEC3H, _VEC3I = 23, 24, 25, 26
_VEC4D, _VEC4F, _VEC4H, _VEC4I = 27, 28, 29, 30
_DICT = 31
_TOKEN_VECTOR = 41
_SPECIFIER = 42
_VARIABILITY = 44
_TIME_SAMPLES = 46
_DOUBLE_VECTOR = 48

_SCALAR_DTYPES = {
    _BOOL: np.dtype('<u1'), _UCHAR: np.dtype('<u1'),
    _INT: np.dtype('<i4'), _UINT: np.dtype('<u4'),
    _INT64: np.dtype('<i8'), _UINT64: np.dtype('<u8'),
    _HALF: np.dtype('<f2'), _FLOAT: np.dtype('<f4'),
    _DOUBLE: np.dtype('<f8'),
}
# (element dtype, tuple arity)
_VEC_DTYPES = {
    _VEC2D: ('<f8', 2), _VEC2F: ('<f4', 2), _VEC2H: ('<f2', 2),
    _VEC2I: ('<i4', 2),
    _VEC3D: ('<f8', 3), _VEC3F: ('<f4', 3), _VEC3H: ('<f2', 3),
    _VEC3I: ('<i4', 3),
    _VEC4D: ('<f8', 4), _VEC4F: ('<f4', 4), _VEC4H: ('<f2', 4),
    _VEC4I: ('<i4', 4),
    _MAT2D: ('<f8', 4), _MAT3D: ('<f8', 9), _MAT4D: ('<f8', 16),
    _QUATD: ('<f8', 4), _QUATF: ('<f4', 4), _QUATH: ('<f2', 4),
}

_SPEC_PSEUDO_ROOT = 7
_SPEC_PRIM = 6
_SPEC_ATTRIBUTE = 1


def is_usdc(file_path):
    with open(file_path, 'rb') as fh:
        return fh.read(8) == b'PXR-USDC'


def _lz4_block(src):
    """Raw LZ4 block decode."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out += src[i:i + lit]
        i += lit
        if i >= n:
            break
        off = src[i] | (src[i + 1] << 8)
        i += 2
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - off
        for k in range(mlen):
            out.append(out[start + k])
    return bytes(out)


def _decompress(buf):
    """TfFastCompression framing: 1 chunk-count byte (0 = single
    unframed block), then per-chunk i32 size + LZ4 block."""
    nchunks = buf[0]
    if nchunks == 0:
        return _lz4_block(buf[1:])
    out = b''
    i = 1
    for _ in range(nchunks):
        sz = struct.unpack('<i', buf[i:i + 4])[0]
        i += 4
        out += _lz4_block(buf[i:i + sz])
        i += sz
    return out


def _decode_ints(buf, n):
    """Usd_IntegerCompression (32-bit): lz4(common delta + 2-bit codes +
    variable-width deltas), running-summed."""
    if n == 0:
        return np.zeros(0, np.int64)
    data = _decompress(buf)
    common = struct.unpack('<i', data[:4])[0]
    ncode = (2 * n + 7) // 8
    codes = np.frombuffer(data[4:4 + ncode], np.uint8)
    codes = (codes[:, None] >> np.array([0, 2, 4, 6], np.uint8)[None]) & 3
    codes = codes.reshape(-1)[:n]
    vals = data[4 + ncode:]
    sizes = np.choose(codes, [0, 1, 2, 4])
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    deltas = np.full(n, common, np.int64)
    vb = np.frombuffer(vals, np.uint8)
    for code, dt in ((1, np.int8), (2, np.dtype('<i2')), (3,
                                                          np.dtype('<i4'))):
        m = codes == code
        if not m.any():
            continue
        o = offs[m]
        w = np.dtype(dt).itemsize
        raw = vb[o[:, None] + np.arange(w)[None]].tobytes()
        deltas[m] = np.frombuffer(raw, dt).astype(np.int64)
    return np.cumsum(deltas)


class _Crate:
    def __init__(self, data):
        self.f = data
        magic = data[:8]
        if magic != b'PXR-USDC':
            raise ValueError('not a usdc file')
        self.version = tuple(data[8:11])
        if self.version < (0, 4, 0):
            raise NotImplementedError(
                f'crate version {self.version} predates the compressed '
                'layout; re-export with a newer USD')
        toc_off, = struct.unpack('<Q', data[16:24])
        nsec, = struct.unpack('<Q', data[toc_off:toc_off + 8])
        self.sections = {}
        off = toc_off + 8
        for _ in range(nsec):
            name = data[off:off + 16].split(b'\0')[0].decode()
            o, s = struct.unpack('<QQ', data[off + 16:off + 32])
            self.sections[name] = (o, s)
            off += 32
        self._read_tokens()
        self._read_strings()
        self._read_fields()
        self._read_fieldsets()
        self._read_paths()
        self._read_specs()

    # --- section readers ---------------------------------------------
    def _u64(self, off):
        return struct.unpack('<Q', self.f[off:off + 8])[0]

    def _compressed_ints(self, off, n):
        """u64 compressed-size + buffer at ``off``; returns (ints,
        offset past the buffer)."""
        csz = self._u64(off)
        return _decode_ints(self.f[off + 8:off + 8 + csz], n), off + 8 + csz

    def _read_tokens(self):
        o, _ = self.sections['TOKENS']
        ntok, _usz, csz = struct.unpack('<QQQ', self.f[o:o + 24])
        blob = _decompress(self.f[o + 24:o + 24 + csz])
        self.tokens = [t.decode('utf-8', 'replace')
                       for t in blob.split(b'\0')[:ntok]]

    def _read_strings(self):
        o, s = self.sections.get('STRINGS', (None, 0))
        self.strings = []
        if o is None:
            return
        cnt = self._u64(o)
        idx = np.frombuffer(self.f[o + 8:o + 8 + 4 * cnt], '<u4')
        self.strings = [self.tokens[i] for i in idx]

    def _read_fields(self):
        o, _ = self.sections['FIELDS']
        nf = self._u64(o)
        tok_idx, p = self._compressed_ints(o + 8, nf)
        repsz = self._u64(p)
        reps = np.frombuffer(_decompress(self.f[p + 8:p + 8 + repsz]),
                             '<u8', nf)
        self.fields = [(self.tokens[tok_idx[i]], int(reps[i]))
                       for i in range(nf)]

    def _read_fieldsets(self):
        o, _ = self.sections['FIELDSETS']
        nfs = self._u64(o)
        flat, _ = self._compressed_ints(o + 8, nfs)
        # runs of field indices terminated by -1; keyed by start index
        self.fieldsets = {}
        start = 0
        for i, v in enumerate(flat):
            if v == -1 or v == 0xFFFFFFFF:
                self.fieldsets[start] = [int(x) for x in flat[start:i]]
                start = i + 1

    def _read_paths(self):
        o, _ = self.sections['PATHS']
        npaths = self._u64(o)
        n = self._u64(o + 8)
        path_idx, p = self._compressed_ints(o + 16, n)
        elem_tok, p = self._compressed_ints(p, n)
        jumps, p = self._compressed_ints(p, n)
        self.paths = [''] * npaths

        # pxr _BuildDecompressedPathsImpl: preorder with explicit sibling
        # jump offsets
        stack = [(0, None)]              # (entry index, parent path)
        while stack:
            cur, parent = stack.pop()
            while True:
                this = cur
                cur += 1
                if parent is None:
                    path = '/'
                else:
                    tok = self.tokens[abs(int(elem_tok[this]))]
                    sep = '.' if elem_tok[this] < 0 else (
                        '' if parent == '/' else '/')
                    base = '' if parent == '/' else parent
                    path = (base + sep + tok) if elem_tok[this] < 0 \
                        else (base + '/' + tok)
                self.paths[path_idx[this]] = path
                has_child = jumps[this] > 0 or jumps[this] == -1
                has_sibling = jumps[this] >= 0
                if has_child:
                    if has_sibling:
                        stack.append((this + int(jumps[this]), parent))
                    parent = path
                elif has_sibling:
                    continue
                else:
                    break

    def _read_specs(self):
        o, _ = self.sections['SPECS']
        n = self._u64(o)
        path_idx, p = self._compressed_ints(o + 8, n)
        fset_idx, p = self._compressed_ints(p, n)
        spec_ty, p = self._compressed_ints(p, n)
        self.specs = [(int(a), int(b), int(c))
                      for a, b, c in zip(path_idx, fset_idx, spec_ty)]

    # --- value decoding ------------------------------------------------
    def _rep(self, r):
        return ((r >> 48) & 0xFF, bool(r >> 63 & 1), bool(r >> 62 & 1),
                bool(r >> 61 & 1), r & ((1 << 48) - 1))

    def _read_int_array(self, off, dtype, compressed):
        cnt = self._u64(off)
        if not compressed:
            w = np.dtype(dtype).itemsize
            return np.frombuffer(self.f[off + 8:off + 8 + w * cnt],
                                 dtype, cnt).copy()
        ints, _ = self._compressed_ints(off + 8, cnt)
        return ints.astype(dtype)

    def _read_float_array(self, off, dtype, compressed):
        cnt = self._u64(off)
        if not compressed:
            w = np.dtype(dtype).itemsize
            return np.frombuffer(self.f[off + 8:off + 8 + w * cnt],
                                 dtype, cnt).copy()
        code = self.f[off + 8:off + 9]
        if code == b'i':                 # all-integral values
            ints, _ = self._compressed_ints(off + 9, cnt)
            return ints.astype(dtype)
        if code == b't':                 # small lookup table + indices
            lut_n = struct.unpack('<I', self.f[off + 9:off + 13])[0]
            w = np.dtype(dtype).itemsize
            lut = np.frombuffer(self.f[off + 13:off + 13 + w * lut_n],
                                dtype, lut_n)
            idx, _ = self._compressed_ints(off + 13 + w * lut_n, cnt)
            return lut[idx]
        raise NotImplementedError(f'float array code {code!r}')

    def value(self, rep):
        """Decodes a ValueRep into a python value (numpy for arrays)."""
        ty, is_array, inlined, compressed, payload = self._rep(rep)
        if ty == _TIME_SAMPLES:
            return self._time_samples(payload)
        if is_array:
            if ty in _SCALAR_DTYPES:
                dt = _SCALAR_DTYPES[ty]
                if np.issubdtype(dt, np.integer):
                    arr = self._read_int_array(payload, dt, compressed)
                else:
                    arr = self._read_float_array(payload, dt, compressed)
                return arr
            if ty in _VEC_DTYPES:
                dt, k = _VEC_DTYPES[ty]
                cnt = self._u64(payload)
                w = np.dtype(dt).itemsize
                arr = np.frombuffer(
                    self.f[payload + 8:payload + 8 + w * k * cnt], dt,
                    k * cnt).reshape(cnt, k).copy()
                return arr
            if ty in (_TOKEN, _STRING, _ASSET):
                cnt = self._u64(payload)
                idx = np.frombuffer(
                    self.f[payload + 8:payload + 8 + 4 * cnt], '<u4')
                src = self.strings if ty == _STRING else self.tokens
                return [src[i] for i in idx]
            raise NotImplementedError(f'array type {ty}')
        if inlined:
            if ty == _TOKEN:
                return self.tokens[payload]
            if ty == _STRING:
                return self.strings[payload]
            if ty == _ASSET:
                return self.tokens[payload]
            if ty == _BOOL:
                return bool(payload & 1)
            if ty in (_INT, _UINT, _INT64, _UINT64, _UCHAR):
                v = np.int64(np.uint64(payload & 0xFFFFFFFF))
                if ty in (_INT, _INT64):
                    v = np.int32(np.uint32(payload & 0xFFFFFFFF))
                return int(v)
            if ty in (_FLOAT, _DOUBLE):
                # inline floats/doubles store the value's float32 bits
                return float(np.uint32(payload & 0xFFFFFFFF).view(
                    np.float32))
            if ty == _HALF:
                return float(np.uint16(payload & 0xFFFF).view(np.float16))
            if ty in _VEC_DTYPES:
                _, k = _VEC_DTYPES[ty]
                b = struct.pack('<Q', payload)[:k]
                return np.frombuffer(b, np.int8, k).astype(np.float64)
            if ty in (_SPECIFIER, _VARIABILITY):
                return int(payload)
            if ty == _DICT:
                return {}
            raise NotImplementedError(f'inline type {ty}')
        # out-of-line scalars / vectors
        if ty in _SCALAR_DTYPES:
            dt = _SCALAR_DTYPES[ty]
            w = np.dtype(dt).itemsize
            return np.frombuffer(self.f[payload:payload + w], dt, 1)[0]
        if ty in _VEC_DTYPES:
            dt, k = _VEC_DTYPES[ty]
            w = np.dtype(dt).itemsize
            return np.frombuffer(self.f[payload:payload + w * k], dt,
                                 k).copy()
        if ty == _TOKEN_VECTOR:
            cnt = self._u64(payload)
            idx = np.frombuffer(self.f[payload + 8:payload + 8 + 4 * cnt],
                                '<u4')
            return [self.tokens[i] for i in idx]
        if ty == _DOUBLE_VECTOR:
            cnt = self._u64(payload)
            return np.frombuffer(self.f[payload + 8:payload + 8 + 8 * cnt],
                                 '<f8', cnt).copy()
        raise NotImplementedError(f'type {ty} (array={is_array})')

    def _time_samples(self, off):
        """[u64 sz][times data ...][u64 timesRep]  — sz includes the rep —
        then [u64 8][u64 n][n x u64 valueReps]."""
        sz = self._u64(off)
        times_rep = self._u64(off + 8 + sz - 8)
        times = np.asarray(self.value(times_rep), np.float64)
        p = off + 8 + sz
        p += 8                                     # values-section size
        n = self._u64(p)
        reps = struct.unpack(f'<{n}Q', self.f[p + 8:p + 8 + 8 * n])
        return {float(t): self.value(r) for t, r in zip(times, reps)}

    def spec_fields(self, fset_idx):
        out = {}
        for fi in self.fieldsets.get(fset_idx, []):
            name, rep = self.fields[fi]
            out[name] = rep
        return out


def read_usdc(file_path, stage_cls):
    """Parses a usdc file into a ``stage_cls`` (``usd.Stage``) tree."""
    with open(file_path, 'rb') as fh:
        crate = _Crate(fh.read())
    stage = stage_cls(file_path)
    for path_idx, fset_idx, spec_ty in crate.specs:
        path = crate.paths[path_idx]
        fields = crate.spec_fields(fset_idx)
        if spec_ty == _SPEC_PSEUDO_ROOT:
            if 'defaultPrim' in fields:
                stage.default_prim = crate.value(fields['defaultPrim'])
            if 'upAxis' in fields:
                stage.up_axis = crate.value(fields['upAxis'])
        elif spec_ty == _SPEC_PRIM:
            type_name = 'Xform'
            if 'typeName' in fields:
                type_name = crate.value(fields['typeName'])
            stage.define_prim(path, type_name)
        elif spec_ty == _SPEC_ATTRIBUTE:
            prim_path, _, attr_name = path.rpartition('.')
            prim = stage.define_prim(prim_path, None)
            usd_type = 'token'
            if 'typeName' in fields:
                usd_type = crate.value(fields['typeName'])
            if 'default' in fields:
                prim.attrs[attr_name] = (usd_type,
                                         crate.value(fields['default']))
            if 'timeSamples' in fields:
                samples = crate.value(fields['timeSamples'])
                prim.time_attrs[attr_name] = (usd_type, samples)
    return stage
