from aladin_tpu.data.tokenizer import BertWordPieceTokenizer  # noqa: F401
from aladin_tpu.data.tsv import TSVFile  # noqa: F401
