"""Model layer: mini U-Net generator and conditional Wasserstein critic."""

from .generator import (  # noqa: F401
    ConvBlock,
    MiniGenerator,
    UNetGenerator,
    count_parameters,
    create_generator,
)
from .critic import (  # noqa: F401
    ConditionalDiscriminator,
    Discriminator,
    MiniDiscriminator,
    compute_gradient_penalty,
    create_discriminator,
)
