from aladin_tpu.models.bert_img import BertImgConfig, BertImgModel, ImageBertClassifier  # noqa: F401
from aladin_tpu.models.aladin import ALADIN, AladinOutputs  # noqa: F401
