from guacamole_tpu.utils import bases, phred
from guacamole_tpu.utils.progress import progress, DelayedMessages
