"""Import every module that registers `__target__` names, so configs written
against either the reference's dotted paths (src.models...) or this package's
resolve without the caller having to import anything explicitly."""

from .models import camera as _camera  # noqa: F401
from .models import generator as _generator  # noqa: F401
from .models import lighting as _lighting  # noqa: F401
from .utils import pose_sampler as _pose_sampler  # noqa: F401


def _optional(name: str) -> None:
    import importlib

    try:
        importlib.import_module(name, package=__package__)
    except ImportError:
        pass


# modules added as the framework grows; optional so partial checkouts import
for _m in (
    ".models.discriminator",
    ".models.augment",
    ".loss.gan",
    ".loss.position",
    ".trainers.gan_pose_trainer",
    ".data.dataset",
):
    _optional(_m)
