from vectorian_tpu.render.excerpt import ExcerptRenderer  # noqa: F401
from vectorian_tpu.render.location import Location, LocationFormatter  # noqa: F401
from vectorian_tpu.render.matrix import MatrixRenderer, matrix_spec  # noqa: F401
from vectorian_tpu.render.render import Renderer  # noqa: F401
from vectorian_tpu.render.sankey import FlowRenderer  # noqa: F401
from vectorian_tpu.render.utils import flow_edges  # noqa: F401
