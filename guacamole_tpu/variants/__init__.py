from guacamole_tpu.variants.allele import Allele, Genotype
from guacamole_tpu.variants.called import CalledAllele, CalledSomaticAllele
from guacamole_tpu.variants.evidence import AlleleEvidence
