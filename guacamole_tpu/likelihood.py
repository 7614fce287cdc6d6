"""Diploid genotype likelihoods (host, exact float64 path).

For each genotype {a1, a2} over pileup elements e:

  log L(g) = sum_e log(p(a1, e) + p(a2, e)) + log(prior(g)) - depth * log(2)

  p(a, e) = probability_correct(e)      if e.allele == a
            1 - probability_correct(e)  otherwise

Numerical parity note: this implementation reproduces the reference's
float64 operation ORDER exactly (the per-genotype sum over elements is
accumulated right-to-left, matching Colt's aggregate; cf. /root/reference
.../likelihood/Likelihood.scala:149-201), so likelihood values — and
therefore calls and tie-breaks — are bit-identical to the reference caller.

On device, the same math runs as a vectorized f32 screening kernel over
whole loci tiles (see guacamole_tpu.ops); this host path is then applied
only at surviving candidate loci, keeping exactness off the hot path.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

from guacamole_tpu.pileup.element import PileupElement
from guacamole_tpu.pileup.pileup import Pileup
from guacamole_tpu.utils import bases as Bases
from guacamole_tpu.utils.phred import phred_to_success_probability
from guacamole_tpu.variants.allele import Allele, Genotype


def uniform_prior(genotype: Genotype) -> float:
    """Uniform (unnormalized) prior: plain probability, not a log prob."""
    return 1.0


def probability_correct_ignoring_alignment(element: PileupElement) -> float:
    """P(sequenced bases correct) from base quality only."""
    return phred_to_success_probability(element.quality_score)


def probability_correct_including_alignment(element: PileupElement) -> float:
    """P(correct) from base quality and the read's alignment quality."""
    return (
        phred_to_success_probability(element.quality_score)
        * element.read.alignment_likelihood
    )


def likelihoods_of_genotypes(
    elements: Sequence[PileupElement],
    genotypes: Sequence[Genotype],
    probability_correct: Callable[
        [PileupElement], float
    ] = probability_correct_ignoring_alignment,
    prior: Callable[[Genotype], float] = uniform_prior,
    log_space: bool = False,
    normalize: bool = False,
) -> List[float]:
    """Likelihoods of a collection of diploid genotypes over shared elements."""
    alleles = sorted(set(a for g in genotypes for a in g.alleles))
    allele_to_index = {a: i for i, a in enumerate(alleles)}
    depth = len(elements)

    # probabilities[allele index][element index] = p(allele, element)
    success = [probability_correct(e) for e in elements]
    element_alleles = [e.allele for e in elements]
    probabilities = [
        [
            success[j] if allele == element_alleles[j] else 1.0 - success[j]
            for j in range(depth)
        ]
        for allele in alleles
    ]

    log2 = math.log(2)
    log_likelihoods: List[float] = []
    for genotype in genotypes:
        assert genotype.ploidy == 2, "Non-diploid genotype not supported"
        row1 = probabilities[allele_to_index[genotype.alleles[0]]]
        row2 = probabilities[allele_to_index[genotype.alleles[1]]]
        # Right-to-left accumulation (parity with Colt aggregate order).
        acc = 0.0
        if depth > 0:
            acc = math.log(row1[depth - 1] + row2[depth - 1])
            for j in range(depth - 2, -1, -1):
                acc = math.log(row1[j] + row2[j]) + acc
        log_likelihoods.append(acc + math.log(prior(genotype)) - log2 * depth)

    if normalize:
        total = 0.0
        for ll in log_likelihoods:
            total += math.exp(ll)
        log_total = math.log(total)
        log_likelihoods = [ll - log_total for ll in log_likelihoods]
    if log_space:
        return log_likelihoods
    return [math.exp(ll) for ll in log_likelihoods]


def likelihood_of_genotype(
    elements: Sequence[PileupElement],
    genotype: Genotype,
    probability_correct=probability_correct_ignoring_alignment,
    prior=uniform_prior,
    log_space: bool = False,
) -> float:
    result = likelihoods_of_genotypes(
        elements, [genotype], probability_correct, prior, log_space, normalize=False
    )
    assert len(result) == 1
    return result[0]


def possible_genotypes_of_pileup(pileup: Pileup) -> List[Genotype]:
    """All unordered diploid genotypes over the pileup's distinct alleles
    whose alt bases are all standard (empty alts pass vacuously, matching
    Likelihood.scala:106)."""
    alleles = [
        a
        for a in pileup.distinct_alleles
        if all(Bases.is_standard_base(b) for b in a.alt_bases)
    ]
    return [
        Genotype.of(alleles[i], alleles[j])
        for i in range(len(alleles))
        for j in range(i, len(alleles))
    ]


def likelihoods_of_all_possible_genotypes_from_pileup(
    pileup: Pileup,
    probability_correct=probability_correct_ignoring_alignment,
    prior=uniform_prior,
    log_space: bool = False,
    normalize: bool = False,
) -> List[Tuple[Genotype, float]]:
    """(genotype, likelihood) for every genotype with any pileup evidence."""
    genotypes = possible_genotypes_of_pileup(pileup)
    if not genotypes:
        return []
    likelihoods = likelihoods_of_genotypes(
        pileup.elements, genotypes, probability_correct, prior, log_space, normalize
    )
    return list(zip(genotypes, likelihoods))
