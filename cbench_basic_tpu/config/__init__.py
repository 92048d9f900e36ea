from .class_builder import (  # noqa: F401
    ClassBuilder,
    ClassBuilderDict,
    ClassBuilderList,
    ClassBuilderObjRef,
    NamedParam,
    ParamSlot,
    SLOT_ALL_CHOICES,
)
from .import_utils import (  # noqa: F401
    import_all_config_from_dir,
    import_config_from_file,
    import_config_from_module,
    import_class_builder_from_module,
)
