"""Pure-Python JSON-LD 1.1 kernel (no Ray dependencies).

Modules mirror the reference's lib/ layout (SURVEY.md §2) but are
from-scratch implementations of the public W3C specs.
"""
