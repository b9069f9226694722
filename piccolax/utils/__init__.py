from .pytree import pytree_dataclass, static_field
