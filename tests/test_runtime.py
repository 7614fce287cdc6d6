"""Native runtime cross-checks: the C++ decoder's columnar output must match
the Python decoder + event builder field-for-field."""

import numpy as np
import pytest

from guacamole_tpu.gio.load import load_read_set
from guacamole_tpu.reads.read import InputFilters
from guacamole_tpu.runtime.columnar import (
    columnar_from_reads,
    decode_bam_columnar,
    native_available,
)

from conftest import resource_path

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime not built"
)


@pytest.fixture(scope="module", params=["chrM.sorted.bam", "gatk_mini_bundle_extract.bam"])
def pair(request, resources_dir):
    path = resource_path(request.param)
    native = decode_bam_columnar(path)
    assert native is not None
    # Python oracle: all reads incl. duplicates/unmapped-excluded
    read_set = load_read_set(path, InputFilters.empty)
    mapped = [r.as_mapped_read for r in read_set.reads if r.is_mapped]
    python = columnar_from_reads(mapped)
    # native includes unmapped records; restrict to mapped. compact() so the
    # raw-storage comparisons below see cumulative offsets + trimmed data.
    native_mapped = native.select(native.is_mapped_mask).compact()
    return native_mapped, python, read_set


def test_read_counts_match(pair):
    native, python, _ = pair
    assert native.n == python.n


def test_scalar_columns_match(pair):
    native, python, _ = pair
    np.testing.assert_array_equal(native.start, python.start)
    np.testing.assert_array_equal(native.end, python.end)
    np.testing.assert_array_equal(native.mapq, python.mapq)
    np.testing.assert_array_equal(
        native.flags_ & 0x611, python.flags_ & 0x611
    )  # paired/reverse/dup/vendor bits
    np.testing.assert_array_equal(native.mismatches, python.mismatches)


def test_sequences_match(pair):
    native, python, _ = pair
    np.testing.assert_array_equal(native.seq_off, python.seq_off)
    np.testing.assert_array_equal(native.seq, python.seq)
    np.testing.assert_array_equal(native.qual, python.qual)


def test_cigars_match(pair):
    native, python, _ = pair
    np.testing.assert_array_equal(native.cigar_off, python.cigar_off)
    np.testing.assert_array_equal(native.cigar_len, python.cigar_len)
    np.testing.assert_array_equal(native.cigar_op, python.cigar_op)


def test_event_arrays_match(pair):
    native, python, _ = pair
    np.testing.assert_array_equal(native.ev_off, python.ev_off)
    np.testing.assert_array_equal(native.ev_kind, python.ev_kind)
    np.testing.assert_array_equal(native.ev_base, python.ev_base)
    np.testing.assert_array_equal(native.ev_qual, python.ev_qual)
    np.testing.assert_array_equal(native.ev_mdref, python.ev_mdref)


def test_specials_match(pair):
    native, python, _ = pair

    def normalize(c):
        out = []
        for i in range(len(c.sp_read)):
            payload = bytes(
                c.special_payload[
                    c.sp_payload_offset[i] : c.sp_payload_offset[i]
                    + c.sp_payload_len[i]
                ]
            )
            out.append(
                (int(c.sp_read[i]), int(c.sp_offset[i]), int(c.sp_kind[i]),
                 payload, int(c.sp_qual[i]))
            )
        return sorted(out)

    assert normalize(native) == normalize(python)


def test_samples_match(pair):
    native, python, read_set = pair
    native_samples = [native.samples[i] for i in native.sample_id]
    python_samples = [python.samples[i] for i in python.sample_id]
    assert native_samples == python_samples


def test_to_mapped_read_roundtrip(pair):
    native, python, read_set = pair
    mapped = [r.as_mapped_read for r in read_set.reads if r.is_mapped]
    for i in range(0, native.n, max(1, native.n // 50)):
        got = native.to_mapped_read(i)
        want = mapped[i]
        assert got.start == want.start
        assert got.sequence == want.sequence
        assert got.base_qualities == want.base_qualities
        assert got.cigar == want.cigar
        assert got.mdtag == want.mdtag
        assert got.sample_name == want.sample_name
        assert got.is_positive_strand == want.is_positive_strand


@pytest.mark.parametrize(
    "fixture",
    [
        "tumor.chr20.tough.sam",
        "normal.chr20.tough.sam",
        "same_start_reads.sam",
        "rna_chr17_41244936.sam",
        "gatk_mini_bundle_extract.bam",
    ],
)
def test_build_events_native_matches_oracle(fixture, resources_dir):
    """columnar_from_reads(native=True) — the SAM/object ingest path that
    fills event arrays with guac_build_events — must be bit-identical to
    the pure-Python oracle (native=False)."""
    from guacamole_tpu.loci.lociset import parse_loci

    filters = InputFilters.create(overlaps_loci=parse_loci("all"))
    reads = load_read_set(resource_path(fixture), filters).mapped_reads
    oracle = columnar_from_reads(reads, native=False)
    fast = columnar_from_reads(reads, native=True)
    for field in (
        "ref_id", "start", "end", "mapq", "flags_", "mismatches",
        "sample_id", "seq_off", "seq", "qual", "cigar_off", "cigar_len",
        "cigar_op", "md_off", "md_text", "ev_off", "ev_kind", "ev_base",
        "ev_qual", "ev_mdref", "sp_read", "sp_offset", "sp_kind",
        "sp_payload_offset", "sp_payload_len", "sp_qual", "special_payload",
    ):
        np.testing.assert_array_equal(
            getattr(oracle, field), getattr(fast, field), err_msg=field
        )


@pytest.mark.parametrize(
    "fixture",
    [
        "tumor.chr20.tough.sam",
        "normal.chr20.tough.sam",
        "different_start_reads.sam",  # cigar-inconsistent read w/ MD tag
        "same_start_reads.sam",
        "rna_chr17_41244936.sam",
        "testrna.sam",
        "mdtagissue.sam",
    ],
)
def test_decode_sam_native_matches_oracle(fixture, resources_dir):
    """The native SAM text decoder must produce the same columnar content
    as the Python loader + oracle event builder (mapped reads)."""
    from guacamole_tpu.runtime.columnar import decode_sam_columnar

    native = decode_sam_columnar(resource_path(fixture))
    assert native is not None
    read_set = load_read_set(resource_path(fixture), InputFilters.empty)
    mapped = [r.as_mapped_read for r in read_set.reads if r.is_mapped]
    oracle = columnar_from_reads(mapped)
    nm = native.select(native.is_mapped_mask).compact()
    assert nm.n == oracle.n
    for field in (
        "start", "end", "mapq", "mismatches", "seq_off", "seq", "qual",
        "cigar_off", "cigar_len", "cigar_op", "md_off", "md_text",
        "ev_off", "ev_kind", "ev_base", "ev_qual", "ev_mdref",
    ):
        np.testing.assert_array_equal(
            getattr(nm, field), getattr(oracle, field), err_msg=field
        )
    np.testing.assert_array_equal(
        nm.flags_ & 0x611, oracle.flags_ & 0x611
    )  # paired/reverse/dup/vendor bits
    assert [nm.samples[i] for i in nm.sample_id] == [
        oracle.samples[i] for i in oracle.sample_id
    ]
    assert [nm.ref_names[i] for i in nm.ref_id] == [
        oracle.ref_names[i] for i in oracle.ref_id
    ]

    def norm(c):
        out = []
        for i in range(len(c.sp_read)):
            lo = int(c.sp_payload_offset[i])
            pl = bytes(c.special_payload[lo : lo + int(c.sp_payload_len[i])])
            out.append(
                (int(c.sp_read[i]), int(c.sp_offset[i]), int(c.sp_kind[i]),
                 pl, int(c.sp_qual[i]))
            )
        return sorted(out)

    assert norm(nm) == norm(oracle)
