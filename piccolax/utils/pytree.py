"""Dataclass-as-pytree helpers.

`pytree_dataclass` registers a (frozen) dataclass with JAX, splitting fields
into array leaves and static (hashable) metadata via the `static` marker.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

__all__ = ["pytree_dataclass", "static_field", "field"]


def static_field(**kwargs):
    """A dataclass field treated as static pytree metadata (not traced)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["pytree_static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def field(**kwargs):
    return dataclasses.field(**kwargs)


def pytree_dataclass(cls=None, **dc_kwargs):
    """Decorator: make a frozen dataclass and register it as a JAX pytree."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True, **dc_kwargs)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("pytree_static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)

        def flatten(obj):
            children = tuple(getattr(obj, name) for name in data_fields)
            aux = tuple(getattr(obj, name) for name in meta_fields)
            return children, aux

        def flatten_with_keys(obj):
            children = tuple(
                (jax.tree_util.GetAttrKey(name), getattr(obj, name))
                for name in data_fields
            )
            aux = tuple(getattr(obj, name) for name in meta_fields)
            return children, aux

        def unflatten(aux, children):
            kwargs = dict(zip(data_fields, children))
            kwargs.update(dict(zip(meta_fields, aux)))
            obj = object.__new__(c)
            for k, v in kwargs.items():
                object.__setattr__(obj, k, v)
            return obj

        jax.tree_util.register_pytree_with_keys(c, flatten_with_keys, unflatten, flatten)
        c.replace = _replace
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def _replace(self, **changes: Any):
    """Structural field replacement bypassing __init__ (classes here often
    have convenience constructors whose signatures differ from the fields)."""
    vals = {f.name: getattr(self, f.name) for f in dataclasses.fields(self)}
    unknown = set(changes) - set(vals)
    if unknown:
        raise TypeError(f"unknown fields in replace: {unknown}")
    vals.update(changes)
    obj = object.__new__(type(self))
    for k, v in vals.items():
        object.__setattr__(obj, k, v)
    return obj
