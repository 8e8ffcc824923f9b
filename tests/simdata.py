"""Synthetic germline SV read simulation for hermetic e2e tests.

Generates aligned paired-end reads over a random reference with an SV
haplotype (deletion / insertion), emitting the alignments a read mapper
would produce: reads inside reference segments map with full-match
CIGARs and shifted coordinates, junction-crossing reads are soft-
clipped at the breakpoint, and pairs straddling the SV get the
anomalous template sizes that drive Manta's pair evidence. The same
machinery backs the multi-sample germline and large-insertion tests
(reference test analogue: the fake-BAM builders of src/c++/lib/test/
testAlignmentDataUtil.hpp, extended to whole mini-genomes)."""

from __future__ import annotations

import numpy as np

from batchutil import make_batch
from manta_tpu.io.bamwriter import BamWriter

READ_LEN = 100


def random_ref(rng, n: int) -> str:
    return "".join("ACGT"[b] for b in rng.integers(0, 4, n))


def write_fasta(path: str, name: str, seq: str):
    with open(path, "w") as f:
        f.write(f">{name}\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")
    # .fai: name, length, offset-of-first-base, line-bases, line-bytes
    with open(path + ".fai", "w") as f:
        f.write(f"{name}\t{len(seq)}\t{len(name) + 2}\t70\t71\n")


def _revcomp(s: str) -> str:
    return s.translate(str.maketrans("ACGTN", "TGCAN"))[::-1]


def _map_read(hap_pos: int, hap_to_ref, junction_hap: int):
    """Reference mapping for a read starting at hap_pos on the SV
    haplotype: (ref_pos, cigar) with breakpoint soft-clipping."""
    end = hap_pos + READ_LEN
    if end <= junction_hap or hap_pos >= junction_hap:
        return hap_to_ref(hap_pos), f"{READ_LEN}M"
    left = junction_hap - hap_pos
    if left >= READ_LEN // 2:
        return hap_to_ref(hap_pos), f"{left}M{READ_LEN - left}S"
    return hap_to_ref(junction_hap), f"{left}S{READ_LEN - left}M"


def simulate_sample(rng, ref_seq: str, sv_hap: str | None, hap_to_ref,
                    junction_hap: int, depth: int = 30,
                    frag_mean: int = 300, frag_sd: int = 25,
                    copies: int = 1):
    """Read-dict list for one diploid sample; sv_hap None (or copies=0)
    = hom-ref, copies=1 het (half the fragments from the SV haplotype),
    copies=2 hom-alt (every fragment from the SV haplotype)."""
    reads = []
    n_frags = depth * len(ref_seq) // (2 * READ_LEN)
    if sv_hap is None or copies == 0:
        haps = [ref_seq]
    elif copies >= 2:
        haps = [sv_hap]
    else:
        haps = [ref_seq, sv_hap]
    for k in range(n_frags):
        hap_i = k % len(haps)
        hap = haps[hap_i]
        frag = int(np.clip(rng.normal(frag_mean, frag_sd), 220, 420))
        p = int(rng.integers(0, len(hap) - frag - 1))
        r1_seq = hap[p:p + READ_LEN]
        r2_seq = hap[p + frag - READ_LEN:p + frag]
        if hap is ref_seq:
            pos1, cig1 = p, f"{READ_LEN}M"
            pos2, cig2 = p + frag - READ_LEN, f"{READ_LEN}M"
        else:
            pos1, cig1 = _map_read(p, hap_to_ref, junction_hap)
            pos2, cig2 = _map_read(p + frag - READ_LEN, hap_to_ref,
                                   junction_hap)
        tlen = (pos2 + READ_LEN) - pos1
        name = f"sim{hap_i}_{k}"
        common = dict(refid=0, next_refid=0, mapq=60, qual=35)
        reads.append(dict(common, name=name, pos=pos1, cigar=cig1,
                          seq=r1_seq, next_pos=pos2, tlen=tlen,
                          flag=0x1 | 0x2 | 0x40 | 0x20))
        # read2 SEQ is stored reference-strand forward in BAM
        reads.append(dict(common, name=name, pos=pos2, cigar=cig2,
                          seq=r2_seq, next_pos=pos1,
                          tlen=-tlen, flag=0x1 | 0x2 | 0x80 | 0x10))
    reads.sort(key=lambda r: r["pos"])
    return reads


def write_sample_bam(path: str, sample: str, chrom: str, chrom_len: int,
                     reads):
    header = ("@HD\tVN:1.6\tSO:coordinate\n"
              f"@SQ\tSN:{chrom}\tLN:{chrom_len}\n"
              f"@RG\tID:rg1\tSM:{sample}\n")
    batch = make_batch(reads)
    w = BamWriter(path, header, [chrom], [chrom_len])
    for i in range(batch.n):
        w.add_record(batch, i)
    w.close()


def make_deletion_dataset(tmp_dir, del_beg: int = 10000,
                          del_len: int = 500, ref_len: int = 24000,
                          carriers=(True, True, True, False, False),
                          seed: int = 5):
    """Reference fasta + per-sample BAMs for a deletion carried at
    0/1/2 copies per sample (bool carriers mean het). Returns
    (fasta_path, [bam_paths], names)."""
    rng = np.random.default_rng(seed)
    ref_seq = random_ref(rng, ref_len)
    fa = str(tmp_dir / "sim.fa")
    write_fasta(fa, "chrS", ref_seq)
    sv_hap = ref_seq[:del_beg] + ref_seq[del_beg + del_len:]

    def hap_to_ref(hp):
        return hp if hp < del_beg else hp + del_len

    bams = []
    names = []
    for si, carrier in enumerate(carriers):
        name = f"S{si + 1}"
        copies = int(carrier)
        reads = simulate_sample(rng, ref_seq,
                                sv_hap if copies else None,
                                hap_to_ref, del_beg, copies=copies)
        p = str(tmp_dir / f"{name}.bam")
        write_sample_bam(p, name, "chrS", ref_len, reads)
        bams.append(p)
        names.append(name)
    return fa, bams, names


def make_insertion_dataset(tmp_dir, ins_beg: int = 10000,
                           ins_len: int = 400, ref_len: int = 24000,
                           carriers=(True,), seed: int = 9,
                           depth: int = 40):
    """Reference fasta + BAMs for a heterozygous novel-sequence
    insertion: junction-crossing reads soft-clip at the insertion
    point, and reads falling entirely inside the novel sequence emit
    as unmapped shadows at their anchor mate's position (the evidence
    the semi-assembled large-insertion path consumes; reference:
    SVCandidateAssemblyRefiner processLargeInsertion:833 +
    ShadowReadFinder). Returns (fasta, [bams], names, ins_seq)."""
    rng = np.random.default_rng(seed)
    ref_seq = random_ref(rng, ref_len)
    fa = str(tmp_dir / "sim_ins.fa")
    write_fasta(fa, "chrS", ref_seq)
    ins_seq = random_ref(rng, ins_len)
    sv_hap = ref_seq[:ins_beg] + ins_seq + ref_seq[ins_beg:]
    jL, jR = ins_beg, ins_beg + ins_len  # junctions in hap coords

    def map_one(p):
        """(ref_pos, cigar, mapped) for a read at hap pos p."""
        end = p + READ_LEN
        if end <= jL:
            return p, f"{READ_LEN}M", True
        if p >= jR:
            return p - ins_len, f"{READ_LEN}M", True
        if p < jL:
            left = jL - p
            if left >= 20:
                return p, f"{left}M{READ_LEN - left}S", True
            return -1, "", False
        if end > jR:
            right = end - jR
            if right >= 20:
                return ins_beg, f"{READ_LEN - right}S{right}M", True
            return -1, "", False
        return -1, "", False  # fully inside the novel sequence

    bams, names = [], []
    for si, carrier in enumerate(carriers):
        name = f"I{si + 1}"
        reads = []
        haps = [ref_seq, sv_hap] if carrier else [ref_seq]
        n_frags = depth * ref_len // (2 * READ_LEN)
        for k in range(n_frags):
            hap = haps[k % len(haps)]
            frag = int(np.clip(rng.normal(300, 25), 220, 420))
            p = int(rng.integers(0, len(hap) - frag - 1))
            r1 = hap[p:p + READ_LEN]
            r2 = hap[p + frag - READ_LEN:p + frag]
            if hap is ref_seq:
                m1 = (p, f"{READ_LEN}M", True)
                m2 = (p + frag - READ_LEN, f"{READ_LEN}M", True)
            else:
                m1 = map_one(p)
                m2 = map_one(p + frag - READ_LEN)
            if not (m1[2] or m2[2]):
                continue  # both mates inside the insertion: unaligned
            name_k = f"ins{k}"
            common = dict(refid=0, next_refid=0, qual=35)
            f1 = 0x1 | 0x40 | 0x20
            f2 = 0x1 | 0x80 | 0x10
            pos1, cig1 = m1[0], m1[1]
            pos2, cig2 = m2[0], m2[1]
            if not m1[2]:
                # shadow: unmapped read placed at its mapped mate
                pos1, cig1 = pos2, ""
                f1 = 0x1 | 0x4 | 0x40
                f2 |= 0x8
            if not m2[2]:
                pos2, cig2 = pos1, ""
                f2 = 0x1 | 0x4 | 0x80
                f1 |= 0x8
            both = m1[2] and m2[2]
            tlen = (pos2 + READ_LEN) - pos1 if both else 0
            reads.append(dict(common, name=name_k, pos=pos1, cigar=cig1,
                              seq=r1, next_pos=pos2, tlen=tlen, flag=f1,
                              mapq=60 if m1[2] else 0))
            reads.append(dict(common, name=name_k, pos=pos2, cigar=cig2,
                              seq=r2, next_pos=pos1, tlen=-tlen, flag=f2,
                              mapq=60 if m2[2] else 0))
        reads.sort(key=lambda r: r["pos"])
        p_out = str(tmp_dir / f"{name}.bam")
        write_sample_bam(p_out, name, "chrS", ref_len, reads)
        bams.append(p_out)
        names.append(name)
    return fa, bams, names, ins_seq


def write_multi_fasta(path: str, seqs: dict):
    with open(path, "w") as f:
        offs = {}
        off = 0
        for name, seq in seqs.items():
            f.write(f">{name}\n")
            off += len(name) + 2
            offs[name] = off
            for i in range(0, len(seq), 70):
                f.write(seq[i:i + 70] + "\n")
            off += len(seq) + (len(seq) + 69) // 70
    with open(path + ".fai", "w") as f:
        for name, seq in seqs.items():
            f.write(f"{name}\t{len(seq)}\t{offs[name]}\t70\t71\n")


def make_fusion_dataset(tmp_dir, seed: int = 13, depth: int = 40):
    """RNA fusion: a transcript joining chrA[4000:6000] to
    chrB[6000:8000]. Junction-crossing reads soft-clip at the fusion
    point and straddling pairs emit as interchromosomal mates — the
    evidence the RNA mode's spanning/split machinery consumes
    (reference: --rna fusion calling, scoreRNASV). Returns
    (fasta, bam, junction) with junction = ("chrA", 6000, "chrB", 6000)."""
    rng = np.random.default_rng(seed)
    ref_a = random_ref(rng, 12000)
    ref_b = random_ref(rng, 12000)
    fa = str(tmp_dir / "fusion.fa")
    write_multi_fasta(fa, {"chrA": ref_a, "chrB": ref_b})
    LA = 2000
    transcript = ref_a[4000:6000] + ref_b[6000:8000]

    def map_t(t):
        """(refid, pos, cigar) for a transcript read at t; None if the
        aligned stub would be too short."""
        end = t + READ_LEN
        if end <= LA:
            return 0, 4000 + t, f"{READ_LEN}M"
        if t >= LA:
            return 1, 6000 + (t - LA), f"{READ_LEN}M"
        left = LA - t
        if left >= 20:
            return 0, 4000 + t, f"{left}M{READ_LEN - left}S"
        if READ_LEN - left >= 20:
            return 1, 6000, f"{left}S{READ_LEN - left}M"
        return None

    reads = []
    k = 0

    def emit_pair(m1, seq1, m2, seq2):
        nonlocal k
        k += 1
        name = f"fus{k}"
        tid1, pos1, cig1 = m1
        tid2, pos2, cig2 = m2
        same = tid1 == tid2
        tlen = (pos2 + READ_LEN) - pos1 if same else 0
        common = dict(mapq=60, qual=35)
        reads.append(dict(common, name=name, refid=tid1, pos=pos1,
                          cigar=cig1, seq=seq1, next_refid=tid2,
                          next_pos=pos2, tlen=tlen,
                          flag=0x1 | 0x40 | 0x20 | (0x2 if same else 0)))
        reads.append(dict(common, name=name, refid=tid2, pos=pos2,
                          cigar=cig2, seq=seq2, next_refid=tid1,
                          next_pos=pos1, tlen=-tlen,
                          flag=0x1 | 0x80 | 0x10 | (0x2 if same else 0)))

    # transcript (fusion) fragments
    n_frags = depth * len(transcript) // (2 * READ_LEN)
    for _ in range(n_frags):
        frag = int(np.clip(rng.normal(300, 25), 220, 420))
        t = int(rng.integers(0, len(transcript) - frag - 1))
        m1 = map_t(t)
        m2 = map_t(t + frag - READ_LEN)
        if m1 is None or m2 is None:
            continue
        emit_pair(m1, transcript[t:t + READ_LEN],
                  m2, transcript[t + frag - READ_LEN:t + frag])
    # background expression over both source genes (wild-type alleles
    # and fragment-size statistics)
    for refid, ref_seq in ((0, ref_a), (1, ref_b)):
        for _ in range(depth * len(ref_seq) // (2 * READ_LEN)):
            frag = int(np.clip(rng.normal(300, 25), 220, 420))
            p = int(rng.integers(0, len(ref_seq) - frag - 1))
            emit_pair((refid, p, f"{READ_LEN}M"),
                      ref_seq[p:p + READ_LEN],
                      (refid, p + frag - READ_LEN, f"{READ_LEN}M"),
                      ref_seq[p + frag - READ_LEN:p + frag])
    reads.sort(key=lambda r: (r["refid"], r["pos"]))
    header = ("@HD\tVN:1.6\tSO:coordinate\n"
              "@SQ\tSN:chrA\tLN:12000\n@SQ\tSN:chrB\tLN:12000\n"
              "@RG\tID:rg1\tSM:RNA1\n")
    batch = make_batch(reads)
    bam = str(tmp_dir / "fusion.bam")
    w = BamWriter(bam, header, ["chrA", "chrB"], [12000, 12000])
    for i in range(batch.n):
        w.add_record(batch, i)
    w.close()
    return fa, bam, ("chrA", 6000, "chrB", 6000)
