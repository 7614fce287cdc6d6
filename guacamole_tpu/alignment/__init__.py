from guacamole_tpu.alignment.affine_gap import (
    AlignmentState,
    ReadAlignment,
    align,
)
