from .model import (  # noqa: F401
    SimpleGANParams,
    generate_samples,
    generator_forward,
    discriminator_forward,
    init_params,
    pattern_score,
    patterns,
    train,
)
from .export import (  # noqa: F401
    export_weights_txt,
    load_weights_txt,
    quantize_params,
    generator_int_forward,
    discriminator_int_forward,
)
