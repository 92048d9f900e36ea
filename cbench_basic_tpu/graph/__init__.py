from .builders import (  # noqa: F401
    build_basic_scalable_graph,
    build_hyperprior_graph,
    build_topogroup_hyperprior_graph,
)
from .latent_graph import LatentGraphModel, rd_loss  # noqa: F401
from .node_coders import FactorizedCoder, GaussianCoder, LossyDummyCoder  # noqa: F401
from .topogroup import TopoGroupGaussianCoder, topo_group_map  # noqa: F401
