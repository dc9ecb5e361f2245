from twopaco_tpu.io.fasta import read_fasta, read_all_records, FastaError
from twopaco_tpu.io.junctions import (
    JunctionWriter,
    read_junctions,
    SEPARATOR_POS,
    SEPARATOR_ID,
)
from twopaco_tpu.io.windows import WindowConfig, iter_window_batches
