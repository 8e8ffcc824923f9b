"""Test-support CRAM 3.0 encoder.

Builds real CRAM files from synthetic alignment records so the
production decoder (manta_tpu/io/cram.py) can be exercised over the
full format surface: core-bitstream codecs (HUFFMAN/BETA/GAMMA),
external codecs (EXTERNAL/BYTE_ARRAY_LEN/BYTE_ARRAY_STOP), read
features (substitution/insert/delete/softclip/refskip/hardclip),
in-slice mate chains, detached mates, tag dictionaries, and the
raw/gzip/rANS-4x8 block compression methods. Mirrors the reference's
synthetic-input fixture pattern (reference:
src/c++/lib/test/testAlignmentDataUtil.hpp:43-92) at the CRAM layer.

This is an independent implementation of the *encode* direction of the
CRAM spec; it shares no code with the decoder.
"""

from __future__ import annotations

import struct
import zlib

RANS_LOW = 1 << 23
TF = 4096

# ---------------------------------------------------------------------------
# varints


def itf8(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF,
                      v & 0xFF])
    return bytes([0xF0 | ((v >> 28) & 0x0F), (v >> 20) & 0xFF,
                  (v >> 12) & 0xFF, (v >> 4) & 0xFF, v & 0x0F])


def ltf8(v: int) -> bytes:
    v &= (1 << 64) - 1
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24)]) + v.to_bytes(4, "big")[1:]
    if v < 1 << 35:
        return bytes([0xF0 | (v >> 32)]) + (v & 0xFFFFFFFF).to_bytes(4, "big")
    raise ValueError("ltf8 value too large for test encoder")


def itf8_array(vals) -> bytes:
    out = itf8(len(vals))
    for v in vals:
        out += itf8(v)
    return out


# ---------------------------------------------------------------------------
# rANS 4x8 encoder (spec section 13)


def _norm_freqs(counts: dict[int, int], total: int) -> dict[int, int]:
    freqs = {}
    for s in sorted(counts):
        freqs[s] = max(1, (counts[s] * TF) // total)
    big = max(freqs, key=lambda s: freqs[s])
    freqs[big] += TF - sum(freqs.values())
    assert freqs[big] > 0
    return freqs


def _freq_table(freqs: dict[int, int]) -> bytes:
    out = bytearray()
    syms = sorted(freqs)

    def emit_f(f):
        if f >= 128:
            out.append(0x80 | (f >> 8))
            out.append(f & 0xFF)
        else:
            out.append(f)

    k = 0
    while k < len(syms):
        s = syms[k]
        out.append(s)
        run = 0
        while k + run + 1 < len(syms) and syms[k + run + 1] == \
                syms[k + run] + 1:
            run += 1
        emit_f(freqs[s])
        if run >= 1:
            out.append(s + 1)
            out.append(run - 1)
            for m in range(1, run + 1):
                emit_f(freqs[syms[k + m]])
            k += run + 1
        else:
            k += 1
    out.append(0)
    return bytes(out)


def rans_compress_o0(data: bytes) -> bytes:
    import collections
    cnt = collections.Counter(data)
    freqs = _norm_freqs(cnt, len(data))
    cum = {}
    x = 0
    for s in sorted(freqs):
        cum[s] = x
        x += freqs[s]
    table = _freq_table(freqs)
    R = [RANS_LOW] * 4
    buf = bytearray()
    for i in range(len(data) - 1, -1, -1):
        s = data[i]
        f = freqs[s]
        x = R[i & 3]
        xmax = ((RANS_LOW >> 12) << 8) * f
        while x >= xmax:
            buf.append(x & 0xFF)
            x >>= 8
        R[i & 3] = ((x // f) << 12) + (x % f) + cum[s]
    for j in (3, 2, 1, 0):
        x = R[j]
        buf += bytes([(x >> 24) & 0xFF, (x >> 16) & 0xFF,
                      (x >> 8) & 0xFF, x & 0xFF])
    payload = table + bytes(reversed(buf))
    return bytes([0]) + len(payload).to_bytes(4, "little") + \
        len(data).to_bytes(4, "little") + payload


def rans_compress_o1(data: bytes) -> bytes:
    import collections
    n = len(data)
    q = n >> 2
    pairs: dict[int, collections.Counter] = collections.defaultdict(
        collections.Counter)
    starts = [0, q, 2 * q, 3 * q, n]
    for k in range(4):
        ctx = 0
        hi = starts[k + 1] if k < 3 else n
        for i in range(starts[k], hi):
            pairs[ctx][data[i]] += 1
            ctx = data[i]
    freqs, cums = {}, {}
    for ctx, cnt in pairs.items():
        f = _norm_freqs(cnt, sum(cnt.values()))
        freqs[ctx] = f
        x = 0
        cm = {}
        for s in sorted(f):
            cm[s] = x
            x += f[s]
        cums[ctx] = cm
    out = bytearray()
    ctxs = sorted(freqs)
    k = 0
    while k < len(ctxs):
        c0 = ctxs[k]
        out.append(c0)
        run = 0
        while k + run + 1 < len(ctxs) and ctxs[k + run + 1] == \
                ctxs[k + run] + 1:
            run += 1
        out += _freq_table(freqs[c0])
        if run >= 1:
            out.append(c0 + 1)
            out.append(run - 1)
            for m in range(1, run + 1):
                out += _freq_table(freqs[ctxs[k + m]])
            k += run + 1
        else:
            k += 1
    out.append(0)
    # exact reverse of the decoder's op sequence
    ops = []
    idx = [0, q, 2 * q, 3 * q]
    ctx = [0, 0, 0, 0]
    for _ in range(q):
        for kk in range(4):
            ops.append((kk, idx[kk], ctx[kk]))
            ctx[kk] = data[idx[kk]]
            idx[kk] += 1
    for i in range(idx[3], n):
        ops.append((3, i, ctx[3]))
        ctx[3] = data[i]
    R = [RANS_LOW] * 4
    buf = bytearray()
    for kk, i, cc in reversed(ops):
        s = data[i]
        f = freqs[cc][s]
        x = R[kk]
        xmax = ((RANS_LOW >> 12) << 8) * f
        while x >= xmax:
            buf.append(x & 0xFF)
            x >>= 8
        R[kk] = ((x // f) << 12) + (x % f) + cums[cc][s]
    for j in (3, 2, 1, 0):
        x = R[j]
        buf += bytes([(x >> 24) & 0xFF, (x >> 16) & 0xFF,
                      (x >> 8) & 0xFF, x & 0xFF])
    payload = bytes(out) + bytes(reversed(buf))
    return bytes([1]) + len(payload).to_bytes(4, "little") + \
        len(data).to_bytes(4, "little") + payload


# ---------------------------------------------------------------------------
# encodings / blocks


def enc_external(cid: int) -> bytes:
    p = itf8(cid)
    return itf8(1) + itf8(len(p)) + p


def enc_huffman(sym_len_pairs) -> bytes:
    syms = [s for s, _ in sym_len_pairs]
    lens = [l for _, l in sym_len_pairs]
    p = itf8_array(syms) + itf8_array(lens)
    return itf8(3) + itf8(len(p)) + p


def enc_beta(offset: int, nbits: int) -> bytes:
    p = itf8(offset) + itf8(nbits)
    return itf8(6) + itf8(len(p)) + p


def enc_gamma(offset: int) -> bytes:
    p = itf8(offset)
    return itf8(9) + itf8(len(p)) + p


def enc_byte_array_stop(stop: int, cid: int) -> bytes:
    p = bytes([stop]) + itf8(cid)
    return itf8(5) + itf8(len(p)) + p


def enc_byte_array_len(len_enc: bytes, val_enc: bytes) -> bytes:
    p = len_enc + val_enc
    return itf8(4) + itf8(len(p)) + p


def block(ctype: int, cid: int, raw: bytes, compress=None) -> bytes:
    if compress is None:
        data, m = raw, 0
    elif compress == "gzip":
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        data = co.compress(raw) + co.flush()
        m = 1
    elif compress == "rans0":
        data, m = rans_compress_o0(raw), 4
    elif compress == "rans1":
        data, m = rans_compress_o1(raw), 4
    else:
        raise ValueError(compress)
    out = bytes([m, ctype]) + itf8(cid) + itf8(len(data)) + itf8(len(raw)) \
        + data
    return out + struct.pack("<I", zlib.crc32(data))


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        for k in range(nbits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([self.cur << (8 - self.nbits)])
        return bytes(self.buf)


def canonical_codes(sym_len_pairs):
    order = sorted(range(len(sym_len_pairs)),
                   key=lambda i: (sym_len_pairs[i][1], sym_len_pairs[i][0]))
    codes = {}
    code = 0
    prev = sym_len_pairs[order[0]][1]
    for i in order:
        s, ln = sym_len_pairs[i]
        code <<= ln - prev
        prev = ln
        codes[s] = (ln, code)
        code += 1
    return codes


# ---------------------------------------------------------------------------
# record model + writer


class CramRec:
    """One alignment record for the test encoder. pos is 0-based;
    cigar is a list of (op_char, length); seq/qual are bytes
    (qual=None means not stored); tags is a list of
    (tag2:str, type:str, raw BAM-encoded value bytes)."""

    def __init__(self, name, flag, ref_id, pos, mapq, cigar, seq, qual,
                 tags=(), mate=None):
        self.name = name
        self.flag = flag
        self.ref_id = ref_id
        self.pos = pos
        self.mapq = mapq
        self.cigar = cigar
        self.seq = seq
        self.qual = qual
        self.tags = list(tags)
        # mate: None (single/defaulted) | ("downstream", nf)
        #       | ("detached", mate_ref, mate_pos0, tlen)
        self.mate = mate


_SUB_ALTS = {
    ord("A"): b"CGTN", ord("C"): b"AGTN", ord("G"): b"ACTN",
    ord("T"): b"ACGN", ord("N"): b"ACGT",
}

# content ids for external streams
_CID = {k: i + 10 for i, k in enumerate(
    ["AP", "RL", "NS", "NP", "TS", "NF", "TL", "RN", "FP", "DL", "IN",
     "SC", "BB", "QQ", "BS", "BA", "QS", "HC", "RS", "PD", "FC", "TAG"])}


def write_cram(path: str, ref_names, ref_lengths, ref_seqs, recs,
               compress="gzip", per_container=10_000,
               extra_header_lines=()) -> None:
    """ref_seqs: dict ref_id -> full chromosome bytes (uppercase)."""
    sam = "@HD\tVN:1.5\tSO:coordinate\n"
    for nm, ln in zip(ref_names, ref_lengths):
        sam += f"@SQ\tSN:{nm}\tLN:{ln}\n"
    for line in extra_header_lines:
        sam += line + "\n"
    out = bytearray()
    out += b"CRAM\x03\x00" + bytes(20)

    # file-header container
    hdr_raw = struct.pack("<i", len(sam)) + sam.encode()
    hdr_block = block(0, 0, hdr_raw, compress=None)
    out += _container_hdr(len(hdr_block), -1 if not recs else 0, 0, 0, 0,
                          0, 0, 1, [0]) + hdr_block

    counter = 0
    i = 0
    while i < len(recs):
        # containers are single-reference: split groups at ref boundaries
        group = [recs[i]]
        while (len(group) < per_container and i + len(group) < len(recs)
               and recs[i + len(group)].ref_id == group[0].ref_id):
            group.append(recs[i + len(group)])
        out += _write_container(group, ref_seqs, counter, compress)
        counter += len(group)
        i += len(group)
    # EOF container (spec fixed content)
    eof_block = block(1, 0, itf8(0) + itf8(0) + itf8(0), compress=None)
    out += _container_hdr(len(eof_block), -1, 4542278, 0, 0, 0, 0, 1, [0])
    out += eof_block
    with open(path, "wb") as f:
        f.write(out)


def _container_hdr(length, ref_id, start, span, nrec, ctr, bases, nblk,
                   landmarks) -> bytes:
    body = itf8(ref_id) + itf8(start) + itf8(span) + itf8(nrec) + \
        ltf8(ctr) + ltf8(bases) + itf8(nblk) + itf8_array(landmarks)
    return struct.pack("<i", length) + body + struct.pack(
        "<I", zlib.crc32(body))


def _write_container(recs, ref_seqs, counter, compress) -> bytes:
    assert len({r.ref_id for r in recs}) == 1, \
        "test encoder emits single-reference containers"
    slice_ref = recs[0].ref_id
    start = min(r.pos for r in recs) + 1
    end = max(r.pos + max(1, sum(n for op, n in r.cigar
                                 if op in "MDN=X")) for r in recs)
    span = end - start + 1

    ext = {cid: bytearray() for cid in _CID.values()}
    core = BitWriter()

    # tag dictionary from distinct tag-line signatures
    tag_lines = []
    line_of = {}
    for r in recs:
        sig = tuple((t, ty) for t, ty, _ in r.tags)
        if sig not in line_of:
            line_of[sig] = len(tag_lines)
            tag_lines.append(sig)
    td_blob = b"".join(
        b"".join(t.encode() + ty.encode() for t, ty in line) + b"\x00"
        for line in tag_lines)

    # HUFFMAN codes for BF and CF over this container (core bitstream)
    bf_vals = sorted({_stored_bf(r) for r in recs})
    cf_vals = sorted({_cf(r) for r in recs})

    def make_code(vals):
        if len(vals) == 1:
            return [(vals[0], 0)]
        import math
        nb = max(1, math.ceil(math.log2(len(vals))))
        # assign flat-ish lengths: canonical requires Kraft sum <= 1
        lens = []
        rem = len(vals)
        # simple: all codes same length nb (works when len <= 2^nb)
        for _ in vals:
            lens.append(nb)
        return list(zip(vals, lens))

    bf_pairs = make_code(bf_vals)
    cf_pairs = make_code(cf_vals)
    bf_codes = canonical_codes(bf_pairs)
    cf_codes = canonical_codes(cf_pairs)

    mq_bits = 8  # BETA(offset=0, 8 bits) covers the full MAPQ range

    # --- encode records ---
    last_apos = start
    for idx, r in enumerate(recs):
        bf = _stored_bf(r)
        ln, code = bf_codes[bf]
        if ln:
            core.write(code, ln)
        cf = _cf(r)
        ln, code = cf_codes[cf]
        if ln:
            core.write(code, ln)
        rlen = len(r.seq)
        ext[_CID["RL"]] += itf8(rlen)
        apos = r.pos + 1
        ext[_CID["AP"]] += itf8(apos - last_apos)
        last_apos = apos
        # RG: constant -1 huffman (no external stream)
        ext[_CID["RN"]] += r.name.encode() + b"\x00"
        if r.mate and r.mate[0] == "detached":
            _, mref, mpos0, tlen = r.mate
            mf = 0
            if r.flag & 0x20:
                mf |= 1
            if r.flag & 0x8:
                mf |= 2
            core.write(mf, 2)  # MF as BETA(0,2)
            ext[_CID["NS"]] += itf8(mref)
            ext[_CID["NP"]] += itf8(mpos0 + 1)
            ext[_CID["TS"]] += itf8(tlen)
        elif r.mate and r.mate[0] == "downstream":
            ext[_CID["NF"]] += itf8(r.mate[1])
        sig = tuple((t, ty) for t, ty, _ in r.tags)
        ext[_CID["TL"]] += itf8(line_of[sig])
        for t, ty, raw in r.tags:
            ext[_CID["TAG"]] += itf8(len(raw)) + raw
        if not (r.flag & 0x4):
            feats = _features(r, ref_seqs[r.ref_id])
            core.write(len(feats), 8)  # FN as BETA(0,8)
            prev = 0
            for (fpos, fc, data) in feats:
                ext[_CID["FC"]].append(ord(fc))
                ext[_CID["FP"]] += itf8(fpos - prev)
                prev = fpos
                if fc == "X":
                    ext[_CID["BS"]].append(data)
                elif fc == "I":
                    ext[_CID["IN"]] += data + b"\x00"
                elif fc == "D":
                    ext[_CID["DL"]] += itf8(data)
                elif fc == "S":
                    ext[_CID["SC"]] += data + b"\x00"
                elif fc == "H":
                    ext[_CID["HC"]] += itf8(data)
                elif fc == "N":
                    ext[_CID["RS"]] += itf8(data)
                elif fc == "P":
                    ext[_CID["PD"]] += itf8(data)
                elif fc == "b":
                    ext[_CID["BB"]] += itf8(len(data)) + data
                elif fc == "i":
                    ext[_CID["BA"]].append(data)
                else:
                    raise ValueError(fc)
            core.write(r.mapq, mq_bits)
            if r.qual is not None:
                ext[_CID["QS"]] += r.qual
        else:
            ext[_CID["BA"]] += r.seq
            if r.qual is not None:
                ext[_CID["QS"]] += r.qual

    # --- compression header ---
    pres = bytearray()
    entries = []
    entries.append(b"RN" + bytes([1]))
    entries.append(b"AP" + bytes([1]))
    entries.append(b"RR" + bytes([1]))
    entries.append(b"SM" + b"\x1b" * 5)
    entries.append(b"TD" + itf8(len(td_blob)) + td_blob)
    pm = itf8(len(entries))
    for e in entries:
        pm += e
    pres += itf8(len(pm)) + pm

    series = {
        b"BF": enc_huffman(bf_pairs),
        b"CF": enc_huffman(cf_pairs),
        b"RL": enc_external(_CID["RL"]),
        b"AP": enc_external(_CID["AP"]),
        b"RG": enc_huffman([(-1, 0)]),
        b"RN": enc_byte_array_stop(0, _CID["RN"]),
        b"MF": enc_beta(0, 2),
        b"NS": enc_external(_CID["NS"]),
        b"NP": enc_external(_CID["NP"]),
        b"TS": enc_external(_CID["TS"]),
        b"NF": enc_external(_CID["NF"]),
        b"TL": enc_external(_CID["TL"]),
        b"FN": enc_beta(0, 8),
        b"FC": enc_external(_CID["FC"]),
        b"FP": enc_external(_CID["FP"]),
        b"DL": enc_external(_CID["DL"]),
        b"BB": enc_byte_array_len(enc_external(_CID["BB"]),
                                  enc_external(_CID["BB"])),
        b"QQ": enc_byte_array_len(enc_external(_CID["QQ"]),
                                  enc_external(_CID["QQ"])),
        b"BS": enc_external(_CID["BS"]),
        b"IN": enc_byte_array_stop(0, _CID["IN"]),
        b"SC": enc_byte_array_stop(0, _CID["SC"]),
        b"HC": enc_external(_CID["HC"]),
        b"RS": enc_external(_CID["RS"]),
        b"PD": enc_external(_CID["PD"]),
        b"BA": enc_external(_CID["BA"]),
        b"QS": enc_external(_CID["QS"]),
        b"MQ": enc_beta(0, mq_bits),
    }
    sm = bytearray()
    for k, v in series.items():
        sm += k + v
    dse = itf8(len(series)) + bytes(sm)
    pres += itf8(len(dse)) + dse
    # tag encodings: every (tag,type) -> BYTE_ARRAY_LEN(len ext, val ext)
    tag_keys = sorted({(t, ty) for line in tag_lines for t, ty in line})
    tm = bytearray()
    for (t, ty) in tag_keys:
        key = (ord(t[0]) << 16) | (ord(t[1]) << 8) | ord(ty)
        tm += itf8(key)
        tm += enc_byte_array_len(enc_external(_CID["TAG"]),
                                 enc_external(_CID["TAG"]))
    tme = itf8(len(tag_keys)) + bytes(tm)
    pres += itf8(len(tme)) + tme

    comp_block = block(1, 0, bytes(pres), compress=None)

    # --- slice ---
    used = [(cid, bytes(data)) for cid, data in sorted(ext.items()) if data]
    core_bytes = core.getvalue()
    sh = itf8(slice_ref) + itf8(start) + itf8(span) + itf8(len(recs)) + \
        ltf8(counter) + itf8(1 + len(used)) + \
        itf8_array([0] + [cid for cid, _ in used]) + itf8(-1) + bytes(16)
    slice_hdr_block = block(2, 0, sh, compress=None)
    data_blocks = bytearray()
    data_blocks += block(5, 0, core_bytes, compress=None)
    methods = ["gzip", "rans0", "rans1", None]
    for k, (cid, data) in enumerate(used):
        m = compress if compress != "mixed" else methods[k % 4]
        if m in ("rans0", "rans1") and len(data) < 8:
            m = None
        data_blocks += block(4, cid, data, compress=m)

    body = comp_block + slice_hdr_block + bytes(data_blocks)
    landmark = len(comp_block)
    nblocks = 1 + 1 + 1 + len(used)
    return _container_hdr(len(body), slice_ref, start, span, len(recs),
                          counter, sum(len(r.seq) for r in recs), nblocks,
                          [landmark]) + body


def _stored_bf(r: CramRec) -> int:
    # mate-unmapped/mate-reverse are restored by the decoder
    return r.flag & ~(0x8 | 0x20)


def _cf(r: CramRec) -> int:
    cf = 0
    if r.qual is not None:
        cf |= 0x1
    if r.mate and r.mate[0] == "detached":
        cf |= 0x2
    if r.mate and r.mate[0] == "downstream":
        cf |= 0x4
    return cf


def _features(r: CramRec, ref: bytes):
    """Derive CRAM read features from (cigar, seq) against the
    reference chromosome."""
    feats = []
    rpos = 1
    gpos = r.pos
    for (op, ln) in r.cigar:
        if op in "M=X":
            for k in range(ln):
                rb = ref[gpos + k] if gpos + k < len(ref) else ord("N")
                qb = r.seq[rpos - 1 + k]
                if qb != rb:
                    alts = _SUB_ALTS.get(rb, b"ACGT")
                    if qb in alts:
                        feats.append((rpos + k, "X", alts.index(qb)))
                    else:
                        # non-ACGTN mismatch: store the base directly
                        feats.append((rpos + k, "b", bytes([qb])))
            rpos += ln
            gpos += ln
        elif op == "I":
            ins = r.seq[rpos - 1:rpos - 1 + ln]
            if ln == 1:
                feats.append((rpos, "i", ins[0]))
            else:
                feats.append((rpos, "I", ins))
            rpos += ln
        elif op == "D":
            feats.append((rpos, "D", ln))
            gpos += ln
        elif op == "N":
            feats.append((rpos, "N", ln))
            gpos += ln
        elif op == "S":
            feats.append((rpos, "S", r.seq[rpos - 1:rpos - 1 + ln]))
            rpos += ln
        elif op == "H":
            feats.append((rpos, "H", ln))
        elif op == "P":
            feats.append((rpos, "P", ln))
        else:
            raise ValueError(op)
    return feats
