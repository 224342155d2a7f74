"""Version of the bzip3_tpu framework.

Format-compatible with BZ3v1 streams produced by reference bzip3 1.5.2.
"""

__version__ = "0.1.0"

# Version of the reference codec whose on-disk format we implement.
FORMAT_COMPAT_VERSION = "1.5.2"
