from . import aggregates, cleaning, joins, pivot, sampling, setops
