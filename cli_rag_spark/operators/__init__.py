"""Engine operators (SURVEY.md §2.c). Each returns a DataFrame built
from declarative ops so Catalyst owns the physical plan."""
