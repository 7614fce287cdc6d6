from guacamole_tpu.pileup.element import (
    Alignment,
    AlignmentKind,
    PileupElement,
)
from guacamole_tpu.pileup.pileup import Pileup
