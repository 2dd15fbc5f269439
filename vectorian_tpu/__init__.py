"""vectorian_tpu — a TPU-native brute-force sentence-search engine.

A from-scratch JAX/XLA/Pallas re-architecture with the capabilities of the
Vectorian (poke1024/vectorian): interactive index-free searches over word
embeddings with sequence alignment (Needleman-Wunsch / Smith-Waterman /
semiglobal), Word Mover's / Word Rotator's Distance, custom vector metrics,
normalization flavors and span embeddings — redesigned for TPU: packed
HBM-resident corpora, batched MXU similarity GEMMs, wavefront alignment DP
over thousands of slices at once, and mesh sharding for multi-chip scale.
"""

__version__ = "0.1.0"

from vectorian_tpu.session import LabSession, Partition, Result, Session
from vectorian_tpu.normalization import (
    LowercaseNormalization,
    Normalization,
    VanillaNormalization,
)
from vectorian_tpu.corpus.document import Document, Span, Token
from vectorian_tpu.importers import (
    Importer,
    MarkdownImporter,
    NovelImporter,
    PlayShakespeareImporter,
    StringImporter,
    TextImporter,
)
from vectorian_tpu.utils.progress import set_verbose

from vectorian_tpu.corpus.corpus import Corpus, TemporaryCorpus  # noqa: F401
from vectorian_tpu.embedding.fasttext import (  # noqa: F401
    CompressedFastTextVectors,
    PretrainedFastText,
)
from vectorian_tpu.embedding.static import (  # noqa: F401
    KeyedVectors,
    OneHotEncoding,
    PretrainedGloVe,
    StackedEmbedding,
    Word2VecVectors,
)
from vectorian_tpu.embedding.contextual import (  # noqa: F401
    LambdaContextualEmbedding,
    TransformerContextualEmbedding,
)
from vectorian_tpu.embedding.span import (  # noqa: F401
    AggregatedTokenEmbedding,
    SentenceEmbedding,
    TextSpanEmbedding,
)
from vectorian_tpu.embedding.pipeline import (  # noqa: F401
    SpacySpanEmbedding,
    decompose_nlp,
    register_decomposer,
)
from vectorian_tpu.embedding.zoo import Zoo  # noqa: F401
from vectorian_tpu.saliency import KeywordSignal, Saliency  # noqa: F401

from vectorian_tpu.parallel.mesh import MeshSearch, make_mesh  # noqa: F401

from vectorian_tpu import alignment, metrics, sim  # noqa: F401

# alias matching the reference's dual naming (__init__.py:24-25)
similarity = metrics
# make ``import vectorian_tpu.similarity`` work as a module alias
# (reference __init__.py:24-25 registers vectorian.similarity)
import sys as _sys

_sys.modules[__name__ + ".similarity"] = metrics


def compile():
    """Build the native host library now (reference's dev compile() hook,
    __init__.py:5-23; normally built lazily on first use)."""
    from vectorian_tpu import native

    return native.available()


def backend_build_time():
    """Build timestamp of the native library (reference
    backend_build_time(), core/cpp/module.cpp:20-34); None if not built."""
    import datetime

    from vectorian_tpu.native import _native_dir

    so = _native_dir() / "libvectorian_native.so"
    if not so.exists():
        return None
    return datetime.datetime.fromtimestamp(so.stat().st_mtime)
