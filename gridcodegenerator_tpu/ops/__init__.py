from . import fd, fd_grad, minv, rnea, rnea_grad, spatial
