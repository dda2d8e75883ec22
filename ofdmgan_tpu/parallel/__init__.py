from .mesh import (  # noqa: F401
    fold_device_key,
    make_mesh,
    make_sharded_train_step,
    replicate_state,
)
from .gspmd import make_gspmd_train_step  # noqa: F401
from .pipeline import make_pp_supervised_train_step, unet_stage_fns  # noqa: F401
from . import distributed  # noqa: F401
