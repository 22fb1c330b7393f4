from gvl_tpu.data.vocabulary import Translator, ClassMap  # noqa: F401
from gvl_tpu.data.dataset import DenseVideoDataset, Batcher  # noqa: F401
