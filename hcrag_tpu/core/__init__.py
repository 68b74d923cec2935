from hcrag_tpu.core.dense_index import DenseIndex  # noqa: F401
from hcrag_tpu.core.graph import CsrGraph, EllAdjacency  # noqa: F401
from hcrag_tpu.core.vocab import EntityVocab  # noqa: F401
