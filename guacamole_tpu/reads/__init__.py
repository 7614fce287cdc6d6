from guacamole_tpu.reads.cigar import Cigar, CigarElement
from guacamole_tpu.reads.mdtag import MdTag
from guacamole_tpu.reads.read import (
    InputFilters,
    MappedRead,
    MateAlignmentProperties,
    PairedMappedRead,
    PairedRead,
    UnmappedRead,
    make_read,
)
