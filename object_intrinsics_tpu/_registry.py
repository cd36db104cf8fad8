"""Import every module that registers `__target__` names, so configs written
against either the reference's dotted paths (src.models...) or this package's
resolve without the caller having to import anything explicitly."""

from .models import camera as _camera  # noqa: F401
from .models import generator as _generator  # noqa: F401
from .models import lighting as _lighting  # noqa: F401
from .utils import pose_sampler as _pose_sampler  # noqa: F401


def _optional(name: str) -> None:
    """Import a registering module if it exists. Only a *missing module file*
    is tolerated (partial checkouts); any other import-time failure — a bug
    inside the module or a missing dependency — propagates with its real
    traceback instead of degrading into a confusing "cannot resolve
    __target__" KeyError at config-build time."""
    import importlib

    full = __package__ + name  # name is package-relative (".models.foo")
    try:
        importlib.import_module(name, package=__package__)
    except ModuleNotFoundError as e:
        # tolerated: the module itself or one of its parent packages is
        # absent (partial checkout); anything else is a real bug
        if e.name != full and not (e.name and full.startswith(e.name + ".")):
            raise


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
