from .mesh import (  # noqa: F401
    fold_device_key,
    make_mesh,
    make_sharded_train_step,
    replicate_state,
)
from .gspmd import make_gspmd_train_step  # noqa: F401
from .pipeline import (  # noqa: F401
    make_pp_supervised_train_step,
    make_pp_trainstate_step,
    unet_stage_fns,
)
from . import distributed  # noqa: F401
