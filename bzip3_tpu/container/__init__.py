"""Container layer: BZ3v1 file/frame headers and chunk framing.

Format reference: /root/reference/doc/bzip3_format.md.
"""
