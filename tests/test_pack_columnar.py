"""Columnar packer cross-validation: pack_tile_columnar must equal the
object-model fast packer on identical read sets (both native-decoded and
Python-fallback columnar inputs)."""

import numpy as np
import pytest

from guacamole_tpu.gio.load import load_read_set
from guacamole_tpu.loci.lociset import parse_loci
from guacamole_tpu.pack.columnar import pack_tile_columnar, pack_tiles_columnar
from guacamole_tpu.pack.fast import pack_tile_fast
from guacamole_tpu.pack.tiles import pack_tiles
from guacamole_tpu.reads.read import InputFilters
from guacamole_tpu.runtime.columnar import (
    columnar_from_reads,
    decode_bam_columnar,
    native_available,
)

from conftest import resource_path
from fixtures import make_test_read
from test_pack import synthetic_reads
from test_pack_fast import assert_tiles_equal


def check_columnar(reads, contig, loci, **kw):
    reads = sorted(
        [r for r in reads if r.cigar.read_length == len(r.sequence)],
        key=lambda r: r.start,
    )
    cols = columnar_from_reads(reads)
    contig_id = cols.ref_names.index(contig)
    want = pack_tile_fast(reads, contig, loci, **kw)
    # numpy columnar path and C++ native packer must both equal the
    # object-path packer
    got_numpy = pack_tile_columnar(
        cols, contig_id, contig, sorted(loci), use_native=False, **kw
    )
    assert_tiles_equal(got_numpy, want)
    got_native = pack_tile_columnar(
        cols, contig_id, contig, sorted(loci), use_native=True, **kw
    )
    assert_tiles_equal(got_native, want)


def test_columnar_synthetic():
    check_columnar(synthetic_reads(), "chr1", range(0, 20))


def test_columnar_sparse_loci():
    check_columnar(synthetic_reads(), "chr1", [1, 3, 4, 9, 15])


def test_columnar_same_start(resources_dir):
    reads = load_read_set(resource_path("same_start_reads.sam")).mapped_reads
    check_columnar(reads, reads[0].reference_contig, range(0, 70))


def test_columnar_rna(resources_dir):
    reads = load_read_set(resource_path("testrna.sam")).mapped_reads
    check_columnar(
        reads, reads[0].reference_contig, range(229580594, 229580894)
    )


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_native_columnar_matches_fast_on_chrm(resources_dir):
    path = resource_path("chrM.sorted.bam")
    cols = decode_bam_columnar(path)
    # object-path reads with identical ordering (all mapped reads)
    reads = [
        r.as_mapped_read
        for r in load_read_set(path, InputFilters.empty).reads
        if r.is_mapped
    ]
    mapped_cols = cols.select(cols.is_mapped_mask)
    contig_id = mapped_cols.ref_names.index("chrM")
    for start in (0, 3000, 16000):
        loci = list(range(start, start + 256))
        got = pack_tile_columnar(mapped_cols, contig_id, "chrM", loci)
        want = pack_tile_fast(
            sorted(reads, key=lambda r: r.start), "chrM", loci
        )
        # ignore read_index (different orderings between the two paths are
        # possible for equal starts); everything else must match
        got_ri, want_ri = got.read_index, want.read_index
        got.read_index = want.read_index = np.zeros_like(got_ri)
        assert_tiles_equal(got, want)
        # read_index must still point at reads with the right start
        real = got_ri >= 0
        np.testing.assert_array_equal(
            mapped_cols.start[got_ri[real]],
            np.asarray(
                [r.start for r in sorted(reads, key=lambda r: r.start)],
                dtype=np.int64,
            )[want_ri[real]],
        )


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_native_pack_tiles_columnar(resources_dir):
    cols = decode_bam_columnar(resource_path("chrM.sorted.bam"))
    mapped = cols.select(cols.is_mapped_mask)
    loci = parse_loci("chrM:0-2000").result().on_contig("chrM")
    tiles = pack_tiles_columnar(mapped, "chrM", loci, tile_size=512)
    assert sum(int((t.loci >= 0).sum()) for t in tiles) == 2000
    assert all(t.L == 512 for t in tiles)
