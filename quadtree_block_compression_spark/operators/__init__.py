"""Spark operators — each module is one SURVEY.md §2 operator family,
expressed DataFrame-first with Arrow UDFs only for pixel/vector math."""
