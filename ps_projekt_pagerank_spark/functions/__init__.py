"""Column-function library (JVM-side built-ins only — no Python in the
row path; SURVEY.md §2.5 notes the reference has no scalar-function
library, so everything here is north-rule / training-pipeline surface)."""
