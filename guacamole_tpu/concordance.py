"""Genotype concordance vs a truth set.

(cf. /root/reference .../Concordance.scala:40-130: printGenotypeConcordance
computes precision/recall/F1 of called genotypes against a truth VCF.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence, Set, Tuple

from guacamole_tpu.gio.vcf import SimpleVariant, VcfRecord, read_vcf
from guacamole_tpu.utils.progress import progress

Site = Tuple[str, int, str, str]  # (contig, start0, ref, alt)


@dataclass(frozen=True)
class ConcordanceResult:
    true_positives: int
    false_positives: int
    false_negatives: int

    @property
    def precision(self) -> float:
        denom = self.true_positives + self.false_positives
        return self.true_positives / denom if denom else 0.0

    @property
    def recall(self) -> float:
        denom = self.true_positives + self.false_negatives
        return self.true_positives / denom if denom else 0.0

    @property
    def f1_score(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0


def _call_sites(records: Iterable[VcfRecord]) -> Set[Site]:
    return {(r.contig, r.start, r.ref, r.alt) for r in records}


def _truth_sites(variants: Iterable[SimpleVariant]) -> Set[Site]:
    return {
        (v.contig, v.start, v.ref, alt) for v in variants for alt in v.alts
    }


def compute_concordance(
    calls: Sequence[VcfRecord], truth_vcf_path: str
) -> ConcordanceResult:
    """Exact-site (contig, position, ref, alt) concordance."""
    called = _call_sites(calls)
    truth = _truth_sites(read_vcf(truth_vcf_path))
    tp = len(called & truth)
    return ConcordanceResult(
        true_positives=tp,
        false_positives=len(called) - tp,
        false_negatives=len(truth) - tp,
    )


def print_genotype_concordance(
    calls: Sequence[VcfRecord], truth_vcf_path: str
) -> ConcordanceResult:
    result = compute_concordance(calls, truth_vcf_path)
    progress(
        "precision = %f, recall = %f, f1-score = %f"
        % (result.precision, result.recall, result.f1_score)
    )
    return result
