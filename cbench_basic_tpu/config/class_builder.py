"""Declarative object-graph config system.

Public-surface parity with reference configs/class_builder.py: configs are
Python files composing ``ClassBuilder(cls, *args, **kwargs)`` trees whose
kwargs may be ``ParamSlot`` choice points; slots are addressable by (dotted)
name across the tree, experiment names derive from non-default slot values,
``batch_update_slot_params`` produces cartesian sweeps, and
``ClassBuilderObjRef`` shares one built object between configs.

Implementation is fresh and much smaller; semantic anchors:
  * ParamSlot choice resolution (class_builder.py:204-222): a fed value that
    is a key of `choices` maps through the dict, anything else passes raw.
  * build_name (class_builder.py:536-561): "prefix(slot=value|...)" from
    slots whose fed value differs from the default.
  * batch_update_slot_params (class_builder.py:878-905): cartesian product
    of per-slot value lists over cloned builders.
"""

from __future__ import annotations

import copy
import hashlib
import inspect
import itertools
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple, Union


class NamedParamBase:
    @property
    def name(self) -> str:
        raise NotImplementedError

    @property
    def param(self) -> Any:
        raise NotImplementedError


class NamedParam(NamedParamBase):
    def __init__(self, name: str, param: Any):
        self._name = name
        self._param = param

    @property
    def name(self):
        return self._name

    @property
    def param(self):
        return self._param


def _param_name(value: Any) -> str:
    if isinstance(value, NamedParamBase):
        return value.name
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(_param_name(v) for v in value) + "]"
    if isinstance(value, float):
        return f"{value:g}"
    if callable(value):
        return getattr(value, "__name__", str(value))
    return str(value)


class ParamSlot(NamedParamBase):
    """A named choice point inside a ClassBuilder's kwargs."""

    def __init__(self, slot_name: str = "",
                 choices: Union[Dict[str, Any], List[Any], None] = None,
                 default: Any = None):
        if "." in slot_name:
            raise ValueError(f"'.' not allowed in slot name {slot_name!r}")
        self.slot_name = slot_name
        self.choices_dict: Dict[Any, Any] = {}
        if isinstance(choices, (list, tuple)):
            for p in choices:
                if isinstance(p, NamedParamBase):
                    self.choices_dict[p.name] = p.param
                else:
                    self.choices_dict[str(p)] = p
        elif isinstance(choices, dict):
            for k, p in choices.items():
                self.choices_dict[k] = p.param if isinstance(p, NamedParamBase) else p
        elif choices is not None:
            raise ValueError(f"invalid choices for slot {slot_name!r}")

        if default is None and self.choices_dict:
            default = next(iter(self.choices_dict.keys()))
        self.default = default

    @property
    def name(self):
        return self.slot_name

    @property
    def param(self):
        return self.default

    @property
    def choices(self):
        return self.choices_dict

    def resolve(self, fed: Any) -> Any:
        """Map a fed value through choices if it is a valid choice key."""
        try:
            if fed in self.choices_dict:
                return self.choices_dict[fed]
        except TypeError:
            pass  # unhashable fed value: pass through
        return fed

    def clone(self) -> "ParamSlot":
        s = ParamSlot(self.slot_name,
                      choices=dict(self.choices_dict) if self.choices_dict else None,
                      default=self.default)
        return s

    def __repr__(self):
        return f"ParamSlot(name={self.slot_name}, default={self.default})"


class ClassBuilderBase(NamedParamBase):
    def build_class(self, *args, **kwargs):
        raise NotImplementedError

    def iter_slots(self, prefix: str = "") -> Iterable[Tuple[str, "ClassBuilderBase", ParamSlot]]:
        """Yield (dotted_path, owner_builder, slot) over the whole tree."""
        return iter(())

    def get_slot_by_name(self, slot_name: str):
        """Resolve a slot by dotted path or by bare name (first match)."""
        matches = []
        for path, owner, slot in self.iter_slots():
            if path == slot_name or slot.slot_name == slot_name:
                matches.append((path, owner, slot))
        return matches[0] if matches else None

    def update_slot_params(self, **kwargs) -> "ClassBuilderBase":
        for name, value in kwargs.items():
            found = self.get_slot_by_name(name)
            if found is None:
                raise KeyError(f"slot {name!r} not found in builder tree")
            _, owner, slot = found
            owner.slots_data[slot.slot_name] = value
        return self

    def get_slot_data_by_name(self, slot_name: str) -> Tuple[bool, Any]:
        found = self.get_slot_by_name(slot_name)
        if found is None:
            return False, None
        _, owner, slot = found
        if slot.slot_name in owner.slots_data:
            return True, owner.slots_data[slot.slot_name]
        return False, None


SLOT_ALL_CHOICES = object()


class ClassBuilder(ClassBuilderBase):
    SLOT_ALL_CHOICES = SLOT_ALL_CHOICES

    def __init__(self, class_init: Callable, *args, **kwargs):
        self.class_init = class_init
        self.args = list(args)
        self.kwargs = dict(kwargs)
        self.slots_data: Dict[str, Any] = {}
        self._override_name: Optional[str] = None
        self._share_built = False
        self._built_obj = None

    # -- naming -------------------------------------------------------------
    @property
    def builder_prefix(self) -> str:
        return getattr(self.class_init, "__name__", str(self.class_init))

    @property
    def name(self) -> str:
        return self.build_name(prefix=self._override_name)

    def set_override_name(self, name: str) -> "ClassBuilder":
        """Override the name PREFIX; non-default slot values still append
        (reference build_name semantics — experiment names always reflect
        the fed slots, class_builder.py:536-561)."""
        self._override_name = name
        return self

    def build_name(self, prefix: Optional[str] = None) -> str:
        prefix = prefix or self._override_name or self.builder_prefix
        defs = []
        for key, arg in self._iter_own_params():
            if isinstance(arg, ParamSlot):
                if arg.slot_name in self.slots_data:
                    fed = self.slots_data[arg.slot_name]
                    if fed != arg.default:
                        defs.append(f"{arg.slot_name}={_param_name(fed)}")
            elif isinstance(arg, ClassBuilderBase):
                sub = arg.build_name() if isinstance(arg, ClassBuilder) else ""
                if isinstance(arg, ClassBuilder) and "=" in sub:
                    defs.append(f"{key}.{sub}")
        return f"{prefix}({'|'.join(defs)})" if defs else prefix

    def get_hashtag(self, hash_length: int = 8) -> str:
        return hashlib.sha256(self.build_name().encode()).hexdigest()[:hash_length]

    def get_name_under_limit(self, name_length_limit: int = 100,
                             hash_length: int = 8) -> str:
        name = self.name
        if len(name) <= name_length_limit:
            return name
        return name[:name_length_limit - hash_length - 1] + "_" + self.get_hashtag(hash_length)

    # -- param iteration ------------------------------------------------------
    def _iter_own_params(self) -> Iterable[Tuple[str, Any]]:
        for i, a in enumerate(self.args):
            yield str(i), a
        yield from self.kwargs.items()

    def iter_slots(self, prefix: str = ""):
        for key, arg in self._iter_own_params():
            if isinstance(arg, ParamSlot):
                path = f"{prefix}{arg.slot_name}"
                yield path, self, arg
                # A filled slot may itself hold a builder (e.g. a sub-config
                # assigned via update_slot_params); its slots stay reachable
                # by dotted path — reference class_builder.py:280-298
                # addresses through the whole tree including slot values.
                value = self.slots_data.get(arg.slot_name)
                if isinstance(value, ClassBuilderBase):
                    yield from value.iter_slots(prefix=f"{path}.")
            elif isinstance(arg, ClassBuilderBase):
                yield from arg.iter_slots(prefix=f"{prefix}{key}.")

    # -- mutation -------------------------------------------------------------
    def update_args(self, *args, **kwargs) -> "ClassBuilder":
        self.args.extend(args)
        self.kwargs.update(kwargs)
        return self

    def remove_args(self, *names: str) -> "ClassBuilder":
        for n in names:
            self.kwargs.pop(n, None)
        return self

    def add_all_kwargs_as_param_slot(
            self, exclude: Iterable[str] = ()) -> "ClassBuilder":
        """Derive a ParamSlot for every defaulted keyword parameter of the
        target (reference ClassBuilder.add_all_kwargs_as_param_slot,
        configs/class_builder.py — used by nearly every sub-config module
        to expose the target's full kwarg surface as addressable slots).

        Works on plain callables and on flax/dataclass modules (whose
        ``__init__`` is generated from the declared fields). Parameters
        already supplied explicitly (as kwargs or slots) and ``exclude``d
        names are left untouched; ``*args``/``**kwargs`` catch-alls and
        parameters without defaults are skipped.
        """
        exclude = set(exclude) | set(self.kwargs)
        try:
            sig = inspect.signature(self.class_init)
        except (TypeError, ValueError):
            return self
        for pname, p in sig.parameters.items():
            if pname in exclude or pname in ("self", "parent", "name"):
                continue
            if p.kind in (inspect.Parameter.VAR_POSITIONAL,
                          inspect.Parameter.VAR_KEYWORD):
                continue
            if p.default is inspect.Parameter.empty:
                continue
            self.kwargs[pname] = ParamSlot(pname, default=p.default)
        return self

    def update_class(self, new_class: Callable, *args, clear_args=False,
                     clear_kwargs=False, **kwargs) -> "ClassBuilder":
        self.class_init = new_class
        if clear_args:
            self.args = []
        if clear_kwargs:
            self.kwargs = {}
        return self.update_args(*args, **kwargs)

    def clone(self, copy_slot_data: bool = True) -> "ClassBuilder":
        def _clone_arg(a):
            if isinstance(a, ParamSlot):
                return a.clone()
            if isinstance(a, ClassBuilderBase):
                return a.clone()
            return copy.deepcopy(a)

        cb = ClassBuilder(self.class_init,
                          *[_clone_arg(a) for a in self.args],
                          **{k: _clone_arg(v) for k, v in self.kwargs.items()})
        if copy_slot_data:
            cb.slots_data = dict(self.slots_data)
        cb._override_name = self._override_name
        cb._share_built = self._share_built
        return cb

    def batch_update_slot_params(self, **update_dict) -> "ClassBuilderList":
        names, values = [], []
        for slot_name, slot_params in update_dict.items():
            if slot_params is SLOT_ALL_CHOICES:
                found = self.get_slot_by_name(slot_name)
                if found is None:
                    raise KeyError(f"slot {slot_name!r} not found")
                slot_params = list(found[2].choices.keys())
            if slot_params is not None:
                names.append(slot_name)
                values.append(slot_params)
        builders = []
        for combo in itertools.product(*values):
            cb = self.clone(copy_slot_data=True)
            cb.update_slot_params(**dict(zip(names, combo)))
            builders.append(cb)
        return ClassBuilderList(*builders)

    # -- sharing ---------------------------------------------------------------
    def share_built_object(self, share: bool = True) -> "ClassBuilder":
        self._share_built = share
        return self

    def get_obj_ref(self):
        return self._built_obj

    # -- building ---------------------------------------------------------------
    def _build_arg(self, arg):
        if isinstance(arg, ParamSlot):
            fed = self.slots_data.get(arg.slot_name, arg.default)
            arg = arg.resolve(fed)
        if isinstance(arg, ClassBuilderBase):
            arg = arg.build_class()
        return arg

    def build_class(self, *args, **kwargs):
        if self._share_built and self._built_obj is not None:
            return self._built_obj
        built_args = [self._build_arg(a) for a in self.args]
        built_kwargs = {k: self._build_arg(v) for k, v in self.kwargs.items()}
        built_kwargs.update(kwargs)
        obj = self.class_init(*built_args, *args, **built_kwargs)
        self._built_obj = obj
        return obj

    def __repr__(self):
        return f"ClassBuilder({self.builder_prefix}, slots={dict(self.slots_data)})"


class ClassBuilderList(ClassBuilderBase):
    def __init__(self, *builders: ClassBuilderBase):
        self.builders = list(builders)

    def __getitem__(self, idx):
        return self.builders[idx]

    def __len__(self):
        return len(self.builders)

    def __iter__(self):
        return iter(self.builders)

    def __add__(self, other: "ClassBuilderList") -> "ClassBuilderList":
        return ClassBuilderList(*(self.builders + list(other)))

    @property
    def name(self):
        return "[" + "|".join(b.name for b in self.builders) + "]"

    def iter_slots(self, prefix: str = ""):
        for i, b in enumerate(self.builders):
            yield from b.iter_slots(prefix=f"{prefix}{i}.")

    def build_class(self, *args, **kwargs):
        return [b.build_class(*args, **kwargs) for b in self.builders]

    def clone(self, **kw):
        return ClassBuilderList(*[b.clone(**kw) for b in self.builders])


class ClassBuilderDict(ClassBuilderBase):
    def __init__(self, **builders):
        self.builders = dict(builders)

    def __getitem__(self, key):
        return self.builders[key]

    def items(self):
        return self.builders.items()

    @property
    def name(self):
        return "{" + "|".join(f"{k}:{getattr(v, 'name', v)}" for k, v in self.builders.items()) + "}"

    def iter_slots(self, prefix: str = ""):
        for k, b in self.builders.items():
            if isinstance(b, ClassBuilderBase):
                yield from b.iter_slots(prefix=f"{prefix}{k}.")

    def build_class(self, *args, **kwargs):
        return {k: (b.build_class() if isinstance(b, ClassBuilderBase) else b)
                for k, b in self.builders.items()}

    def clone(self, **kw):
        return ClassBuilderDict(**{
            k: (b.clone(**kw) if isinstance(b, ClassBuilderBase) else copy.deepcopy(b))
            for k, b in self.builders.items()})


class ClassBuilderObjRef(ClassBuilderBase):
    """Late-bound reference to another builder's built object (optionally
    transformed by obj_func). Parity: class_builder.py:979-1003."""

    def __init__(self, class_builder: ClassBuilder, obj_func: Optional[Callable] = None):
        self.class_builder = class_builder
        self.obj_func = obj_func

    @property
    def name(self):
        return f"ref:{self.class_builder.name}"

    def build_class(self, *args, **kwargs):
        obj = self.class_builder.get_obj_ref()
        if obj is None:
            obj = self.class_builder.build_class()
        if self.obj_func is not None:
            return self.obj_func(obj)
        return obj

    def clone(self, **kw):
        return ClassBuilderObjRef(self.class_builder, self.obj_func)

    def iter_slots(self, prefix: str = ""):
        return iter(())
