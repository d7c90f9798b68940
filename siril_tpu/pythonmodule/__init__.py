"""sirilpy-compatible scripting interface.

The reference ships ``sirilpy`` (python_module/sirilpy, 12k LoC): a
socket+shared-memory client whose ``SirilInterface`` (connection.py:42,
114 methods) drives a running Siril.  Here the framework IS Python, so
the same surface is provided in-process: ``SirilInterface`` wraps a CLI
``Session`` directly — ``cmd()`` runs any command, pixel data moves as
numpy arrays with zero copies instead of SHM.

User scripts written for sirilpy largely work after changing the import:

    import siril_tpu.pythonmodule as sirilpy
    siril = sirilpy.SirilInterface()
    siril.connect()
    siril.cmd("load", "image.fit")
    data = siril.get_image_pixeldata()
"""

from siril_tpu.pythonmodule.connection import (  # noqa: F401
    SirilError,
    SirilInterface,
    CommandError,
)
