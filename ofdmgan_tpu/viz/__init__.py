from . import diagrams, image_transmission, signal_viz  # noqa: F401
from .diagrams import generate_all_diagrams  # noqa: F401
from .signal_viz import create_research_quality_figures  # noqa: F401
