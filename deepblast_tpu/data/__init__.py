from deepblast_tpu.data.alphabet import (  # noqa: F401
    Alphabet,
    ProtT5Tokenizer,
    Uniprot21,
    UniprotTokenizer,
    UniprotPairTokenizer,
)
from deepblast_tpu.data.dataset import (  # noqa: F401
    FastaDataset,
    MaliAlignmentDataset,
    TMAlignDataset,
    collate,
    make_batches,
    read_fasta,
)
from deepblast_tpu.data import state_utils  # noqa: F401
