"""Model definitions: state space and composed densities."""

from .state import State, init_state, is_valid_state  # noqa: F401
from .dating import DatingModel  # noqa: F401
