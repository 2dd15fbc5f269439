"""Shared test fixtures: deterministic synthetic embeddings and corpora."""

import hashlib

import numpy as np

from vectorian_tpu.embedding.static import KeyedVectors

WORDS = """the a an and or but cat dog bird fish runs jumps sleeps eats
house tree river mountain old young big small red blue green happy sad
quickly slowly very quite king queen knight castle sword crown battle
love hate fear hope dream night day sun moon star wind rain snow fire
water earth sky sea ship sail harbor storm wave shore stone road path
walks rides sees hears finds loses keeps gives takes makes breaks""".split()


def word_vector(word: str, dim: int = 32) -> np.ndarray:
    """Deterministic pseudo-random unit vector per word."""
    h = int.from_bytes(hashlib.sha256(word.encode()).digest()[:8], "little")
    rng = np.random.default_rng(h)
    v = rng.normal(size=(dim,)).astype(np.float32)
    return v / np.linalg.norm(v)


def make_embedding(words, dim: int = 32, name="test-emb") -> KeyedVectors:
    mat = np.stack([word_vector(w, dim) for w in words])
    return KeyedVectors(name, list(words), mat)


def make_corpus_texts(rng, n_docs=6, sents_per_doc=12, planted=None):
    """Random sentences; optionally plant specific sentences at known spots.

    Returns (texts, planted_locations) where planted_locations[i] =
    (doc_index, sentence_index).
    """
    texts = []
    locations = []
    planted = list(planted or [])
    pi = 0
    for d in range(n_docs):
        sents = []
        for s in range(sents_per_doc):
            if pi < len(planted) and (d * sents_per_doc + s) % 17 == 3:
                sents.append(planted[pi])
                locations.append((d, s))
                pi += 1
            else:
                k = rng.integers(4, 11)
                sents.append(" ".join(rng.choice(WORDS, size=k)))
        texts.append(". ".join(sents) + ".")
    assert pi == len(planted), "not all planted sentences placed"
    return texts, locations
