"""Closed-form genotype likelihood tests.

Table-driven expectations ported from the reference suite
(cf. /root/reference .../likelihood/LikelihoodSuite.scala:58-211).
"""

import math

import pytest

from guacamole_tpu.likelihood import (
    likelihood_of_genotype,
    likelihoods_of_all_possible_genotypes_from_pileup,
    probability_correct_ignoring_alignment,
)
from guacamole_tpu.pileup.pileup import Pileup
from guacamole_tpu.variants.allele import Allele, Genotype

from fixtures import make_test_read

ERROR_30 = 10.0 ** (-30 / 10.0)
ERROR_40 = 10.0 ** (-40 / 10.0)

REFERENCE_BASE = b"C"


def make_genotype(a1: str, a2: str) -> Genotype:
    return Genotype.of(
        Allele(REFERENCE_BASE, a1.encode()), Allele(REFERENCE_BASE, a2.encode())
    )


def ref_read(phred):
    return make_test_read("C", "1M", "1", 1, quality_scores=[phred])


def alt_read(phred):
    return make_test_read("A", "1M", "0C0", 1, quality_scores=[phred])


def check_genotype_likelihoods(reads, expected):
    pileup = Pileup.from_reads(reads, reads[0].reference_contig, 1)
    for (a1, a2), want in expected.items():
        got = likelihood_of_genotype(
            pileup.elements,
            make_genotype(a1, a2),
            probability_correct_ignoring_alignment,
        )
        assert got == pytest.approx(want, abs=1e-12), f"genotype ({a1},{a2})"


def check_all_possible(actual, expected):
    actual_map = {g: l for g, l in actual}
    assert len(actual_map) == len(expected)
    for (a1, a2), want in expected.items():
        assert actual_map[make_genotype(a1, a2)] == pytest.approx(want, abs=1e-12)


def test_all_reads_ref():
    check_genotype_likelihoods(
        [ref_read(30), ref_read(40), ref_read(30)],
        {
            ("C", "C"): (1 - ERROR_30) * (1 - ERROR_40) * (1 - ERROR_30),
            ("C", "A"): 1.0 / 8,
            ("A", "C"): 1.0 / 8,
            ("A", "A"): ERROR_30 * ERROR_40 * ERROR_30,
            ("A", "T"): ERROR_30 * ERROR_40 * ERROR_30,
        },
    )


def test_two_ref_one_alt():
    check_genotype_likelihoods(
        [ref_read(30), ref_read(40), alt_read(30)],
        {
            ("C", "C"): (1 - ERROR_30) * (1 - ERROR_40) * ERROR_30,
            ("C", "A"): 1.0 / 8,
            ("A", "C"): 1.0 / 8,
            ("A", "A"): ERROR_30 * ERROR_40 * (1 - ERROR_30),
            ("A", "T"): ERROR_30 * ERROR_40 * 1 / 2,
            ("T", "T"): ERROR_30 * ERROR_40 * ERROR_30,
        },
    )


def test_one_ref_two_alt():
    check_genotype_likelihoods(
        [ref_read(30), alt_read(40), alt_read(30)],
        {
            ("C", "C"): (1 - ERROR_30) * ERROR_40 * ERROR_30,
            ("C", "A"): 1.0 / 8,
            ("A", "C"): 1.0 / 8,
            ("A", "A"): ERROR_30 * (1 - ERROR_40) * (1 - ERROR_30),
            ("A", "T"): ERROR_30 * 1 / 2 * 1 / 2,
            ("T", "T"): ERROR_30 * ERROR_40 * ERROR_30,
        },
    )


def test_all_reads_alt():
    check_genotype_likelihoods(
        [alt_read(30), alt_read(40), alt_read(30)],
        {
            ("C", "C"): ERROR_30 * ERROR_40 * ERROR_30,
            ("C", "A"): 1.0 / 8,
            ("A", "C"): 1.0 / 8,
            ("A", "A"): (1 - ERROR_30) * (1 - ERROR_40) * (1 - ERROR_30),
            ("A", "T"): 1.0 / 8,
            ("T", "T"): ERROR_30 * ERROR_40 * ERROR_30,
        },
    )


def test_all_possible_genotypes_all_ref():
    pileup = Pileup.from_reads([ref_read(30), ref_read(40), ref_read(30)], "chr1", 1)
    check_all_possible(
        likelihoods_of_all_possible_genotypes_from_pileup(pileup),
        {("C", "C"): (1 - ERROR_30) * (1 - ERROR_40) * (1 - ERROR_30)},
    )


def test_all_possible_genotypes_mixed():
    pileup = Pileup.from_reads([ref_read(30), ref_read(40), alt_read(30)], "chr1", 1)
    check_all_possible(
        likelihoods_of_all_possible_genotypes_from_pileup(pileup),
        {
            ("C", "C"): (1 - ERROR_30) * (1 - ERROR_40) * ERROR_30,
            ("A", "C"): 1 / 8.0,
            ("A", "A"): ERROR_30 * ERROR_40 * (1 - ERROR_30),
        },
    )


def test_all_possible_genotypes_all_alt():
    pileup = Pileup.from_reads([alt_read(30), alt_read(40), alt_read(30)], "chr1", 1)
    check_all_possible(
        likelihoods_of_all_possible_genotypes_from_pileup(pileup),
        {("A", "A"): (1 - ERROR_30) * (1 - ERROR_40) * (1 - ERROR_30)},
    )


def test_log_space_all_ref():
    pileup = Pileup.from_reads([ref_read(30), ref_read(40), ref_read(30)], "chr1", 1)
    check_all_possible(
        likelihoods_of_all_possible_genotypes_from_pileup(pileup, log_space=True),
        {
            ("C", "C"): math.log(1 - ERROR_30)
            + math.log(1 - ERROR_40)
            + math.log(1 - ERROR_30)
        },
    )


def test_log_space_mixed():
    pileup = Pileup.from_reads([ref_read(30), ref_read(40), alt_read(30)], "chr1", 1)
    check_all_possible(
        likelihoods_of_all_possible_genotypes_from_pileup(pileup, log_space=True),
        {
            ("C", "C"): math.log(1 - ERROR_30)
            + math.log(1 - ERROR_40)
            + math.log(ERROR_30),
            ("A", "C"): math.log(1.0 / 8),
            ("A", "A"): math.log(ERROR_30)
            + math.log(ERROR_40)
            + math.log(1 - ERROR_30),
        },
    )


def test_normalized_likelihoods_sum_to_one():
    pileup = Pileup.from_reads([ref_read(30), ref_read(40), alt_read(30)], "chr1", 1)
    results = likelihoods_of_all_possible_genotypes_from_pileup(
        pileup, normalize=True
    )
    assert sum(l for _, l in results) == pytest.approx(1.0, abs=1e-12)


def test_evidence_from_pileup():
    # cf. AlleleEvidenceSuite.scala
    from guacamole_tpu.variants.evidence import AlleleEvidence

    reads = [
        make_test_read("TCGATCGA", "8M", "1A6", 1, alignment_quality=30),
        make_test_read("TCGATCGA", "8M", "1A6", 1, alignment_quality=30),
        make_test_read("TCGACCCTCGA", "4M3I4M", "1A6", 1, alignment_quality=60),
    ]
    pileup = Pileup.from_reads(reads, "chr1", 2)
    evidence = AlleleEvidence.from_pileup(0.5, Allele.from_strings("A", "C"), pileup)
    assert evidence.mean_mapping_quality == 40.0
    assert evidence.median_mapping_quality == 30
    assert evidence.median_mismatches_per_read == 1


def test_evidence_one_read_supports():
    from guacamole_tpu.variants.evidence import AlleleEvidence

    reads = [
        make_test_read("TAGATCGA", "8M", "8", 1, alignment_quality=30),
        make_test_read("TCGATCGA", "8M", "1A6", 1, alignment_quality=60),
        make_test_read("TAGACCCTCGA", "4M3I4M", "8", 1, alignment_quality=60),
    ]
    pileup = Pileup.from_reads(reads, "chr1", 2)
    evidence = AlleleEvidence.from_pileup(0.5, Allele.from_strings("A", "C"), pileup)
    assert evidence.mean_mapping_quality == 60.0
    assert evidence.median_mapping_quality == 60
    assert evidence.median_mismatches_per_read == 1


def test_evidence_no_read_supports():
    from guacamole_tpu.variants.evidence import AlleleEvidence

    reads = [
        make_test_read("TAGATCGA", "8M", "8", 1, alignment_quality=30),
        make_test_read("TAGATCGA", "8M", "8", 1, alignment_quality=60),
        make_test_read("TAGACCCTCGA", "4M3I4M", "8", 1, alignment_quality=60),
    ]
    pileup = Pileup.from_reads(reads, "chr1", 2)
    evidence = AlleleEvidence.from_pileup(0.5, Allele.from_strings("A", "C"), pileup)
    assert math.isnan(evidence.mean_mapping_quality)
    assert math.isnan(evidence.median_mapping_quality)
    assert math.isnan(evidence.median_mismatches_per_read)
