from . import hessian, nms, patches, scalespace  # noqa: F401
