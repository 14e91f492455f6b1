"""Pluggable-component loading (SURVEY K9).

The reference resolves transformers/key generators reflectively by FQCN
(ScalaReflectionHelper.scala:11-31, ScalaMethodReflectionHelper.scala:13-39,
ScalaModuleReflectionHelper.scala:13-44). Python-native equivalent:
``importlib`` + ``getattr`` over a ``"module.path:attr"`` spec, with
optional method invocation on instances — covering the same three shapes
(instantiate class, call function/method, read module attribute).
"""

from __future__ import annotations

import importlib
from typing import Any


def load_object(spec: str) -> Any:
    """Resolve ``"pkg.module:attr"`` (or dotted ``attr.sub``) to the
    attribute itself — class, function, or module constant."""
    if ":" not in spec:
        raise ValueError(f"plugin spec must be 'module:attr', got {spec!r}")
    mod_name, attr_path = spec.split(":", 1)
    obj = importlib.import_module(mod_name)
    for part in attr_path.split("."):
        obj = getattr(obj, part)
    return obj


def instantiate(spec: str, *args: Any, **kwargs: Any) -> Any:
    """Reference's class-by-name instantiation (ScalaReflectionHelper)."""
    cls = load_object(spec)
    return cls(*args, **kwargs)


def invoke(spec_or_obj: Any, method: str | None = None, *args: Any, **kwargs: Any) -> Any:
    """Invoke a loaded callable, or a named method on an instance
    (ScalaMethodReflectionHelper.invoke equivalent)."""
    obj = load_object(spec_or_obj) if isinstance(spec_or_obj, str) else spec_or_obj
    if method is not None:
        obj = getattr(obj, method)
    return obj(*args, **kwargs)
