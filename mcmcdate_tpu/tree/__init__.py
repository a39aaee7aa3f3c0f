"""Host-side tree structures and Newick I/O."""

from .rose import (  # noqa: F401
    NewickError,
    Node,
    assign_indices,
    bipartition,
    duplicate_leaves,
    make_ultrametric,
    mrca_path,
    node_at_path,
    node_heights,
    normalize_height,
    outgroup,
    parse_newick,
    read_many_newick,
    read_one_newick,
    write_newick,
)
from .flat import FlatTopology  # noqa: F401
