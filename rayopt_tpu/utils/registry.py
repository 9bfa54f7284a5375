"""Polymorphic type registry for dict/YAML round-tripping.

Equivalent of the reference NameMixin (reference name_mixin.py:22-71):
subclasses register under a "type" string; `make` dispatches a plain
dict back to the right class.  This is the backbone of the serializable
front-end (System/Element/Pupil/Conjugate/Material all use it).
"""

__all__ = ["NameMixin"]


class NameMixin:
    _types = {}
    _default_type = None
    _nickname = None
    _type = None
    _typeletter = None

    @classmethod
    def register(cls, sub):
        if sub._type is None:
            sub._type = sub.__name__.lower()
        key = cls, sub._type
        assert key not in cls._types, (key, sub, cls._types)
        cls._types[key] = sub
        return sub

    def dict(self):
        dat = {}
        if self._type != self._default_type:
            dat["type"] = self._type
        if self._nickname:
            dat["nickname"] = self.nickname
        return dat

    @classmethod
    def make(cls, data):
        if isinstance(data, cls):
            return data
        data = dict(data)
        typ = data.pop("type", cls._default_type)
        sub = cls._types[(cls, typ)]
        return sub(**data)

    @property
    def type(self):
        return self._type

    @property
    def typeletter(self):
        return self._typeletter or self._type[0].upper()

    @property
    def nickname(self):
        return self._nickname or hex(id(self))

    @nickname.setter
    def nickname(self, name):
        self._nickname = name

    def __str__(self):
        return f"<{self.typeletter}/{self.nickname}>"
