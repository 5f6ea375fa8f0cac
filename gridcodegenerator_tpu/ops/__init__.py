from . import blops, fd, fd_grad, minv, rnea, rnea_grad, spatial
from . import kernels
