"""BAM writer round-trip through the native reader + BAI queries."""

import numpy as np

from manta_tpu.io.bam import BamReader
from manta_tpu.io.bamwriter import BamWriter


def test_bam_roundtrip(tmp_path, tumor_bam):
    src = BamReader(tumor_bam)
    tid = src.header.name_to_tid["8"]
    batch = src.fetch(tid, 107650000, 107660000)
    assert batch.n > 100

    out = str(tmp_path / "rt.bam")
    w = BamWriter(out, src.header.text, src.header.ref_names,
                  src.header.ref_lengths)
    for i in range(batch.n):
        w.add_record(batch, i, b"ZMZtest|PR\x00")
    w.close()

    rd = BamReader(out)
    got = rd.read_all()
    assert got.n == batch.n
    # spot-check full field fidelity on a sample of records
    for i in range(0, batch.n, max(1, batch.n // 25)):
        assert got.refid[i] == batch.refid[i]
        assert got.pos[i] == batch.pos[i]
        assert got.flag[i] == batch.flag[i]
        assert got.mapq[i] == batch.mapq[i]
        assert got.tlen[i] == batch.tlen[i]
        assert got.name_str(i) == batch.name_str(i)
        assert got.seq_str(i) == batch.seq_str(i)
        np.testing.assert_array_equal(got.qual_arr(i), batch.qual_arr(i))
        np.testing.assert_array_equal(
            got.cigar[got.cigar_off[i]:got.cigar_off[i + 1]],
            batch.cigar[batch.cigar_off[i]:batch.cigar_off[i + 1]])
        assert got.get_tag(i, b"ZM") == "test|PR"
        # original tags preserved too
        assert got.get_tag(i, b"RG") == batch.get_tag(i, b"RG")

    # BAI-driven region fetch returns same-chromosome overlapping reads
    sub = rd.fetch(tid, 107653000, 107653500)
    assert sub.n > 0
    assert all(int(sub.refid[i]) == tid for i in range(sub.n))


def test_native_encode_parity(tumor_bam):
    """Native mt_bam_encode must byte-match the pure-Python encoder."""
    from manta_tpu.io.bamwriter import _encode_group, encode_record
    import struct

    src = BamReader(tumor_bam)
    tid = src.header.name_to_tid["8"]
    batch = src.fetch(tid, 107650000, 107655000)
    assert batch.n > 50
    idx = list(range(0, batch.n, 3))
    extras = [b"" if k % 2 else b"ZMZsv%d|SR\x00" % k
              for k in range(len(idx))]
    blob, out_off, out_end = _encode_group(batch, idx, extras)
    raw = blob.tobytes()
    for k, i in enumerate(idx):
        want = encode_record(batch, i, extras[k])
        got = raw[out_off[k]:out_off[k + 1]]
        assert struct.unpack_from("<I", got)[0] == len(want)
        assert got[4:] == want
