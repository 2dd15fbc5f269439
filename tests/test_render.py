"""Renderer tests: HTML excerpt, SVG flow, vega matrix spec, locations."""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.render import (
    ExcerptRenderer,
    FlowRenderer,
    LocationFormatter,
    MatrixRenderer,
    Renderer,
    matrix_spec,
)
from vectorian_tpu.render.location import to_roman
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .helpers import make_embedding


@pytest.fixture(scope="module")
def result():
    words = ["the", "old", "king", "rides", "grey", "horse", "cat", "sleeps"]
    emb = make_embedding(words)
    docs = [
        StringImporter()(
            "the old king rides the grey horse. a cat sleeps.", title="alpha"
        )
    ]
    session = Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    return index.find("old king rides horse", n=2)


def test_excerpt_renderer(result):
    html = ExcerptRenderer().to_html(result)
    assert "king" in html and "has-text-weight-bold" in html
    assert "tag is-success" in html  # high-similarity tag


def test_full_renderer_iframe(result):
    html = Renderer([ExcerptRenderer()]).to_html(result)
    assert "<iframe" in html and "srcdoc=" in html and "bulma" in html


def test_flow_renderer_svg(result):
    html = FlowRenderer().to_html(result)
    assert "<svg" in html and "king" in html


def test_matrix_spec(result):
    spec = matrix_spec(result[0])
    assert spec["mark"] == "rect"
    assert len(spec["data"]["values"]) >= 3
    html = MatrixRenderer().to_html(result)
    assert "vegaEmbed" in html


def test_result_repr_html(result):
    html = result._repr_html_()
    assert "<iframe" in html


def test_location_formatter():
    fmt = LocationFormatter()

    class Doc:
        metadata = {}

    loc = fmt(Doc(), {"speaker": "HAMLET", "act": 3, "scene": 1})
    assert loc.speaker == "HAMLET" and loc.location == "III.1"
    loc = fmt(Doc(), {"book": 2, "chapter": 5})
    assert loc.location == "Book 2, Chapter 5"
    loc = fmt(Doc(), {"heading": "Intro"})
    assert loc.location == "Intro"
    assert to_roman(1994) == "MCMXCIV"
