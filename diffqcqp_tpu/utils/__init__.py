from .shapes import Canon, canon_like, canon_problem
