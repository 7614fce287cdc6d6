from guacamole_tpu.runtime.columnar import (
    ColumnarReads,
    decode_bam_columnar,
    native_available,
)
