"""Error taxonomy, mirroring the reference's exception hierarchy.

Reference: FormatException.scala:3-5 (corrupt file / undecodable record)
and IncompatibleSchemaException.scala:3-5 (schema mismatch, a subclass).
"""


class FormatException(Exception):
    """Corrupt queue storage or undecodable record.

    Reference parity: raised for bad magic, short reads and entry
    over-runs (JournaledFile.scala:367-373, 388-393, 566, 574-575).
    """


class IncompatibleSchemaException(FormatException):
    """Record arity/type mismatch against the declared schema.

    Reference parity: Schema.scala:22-31 (arity / per-field type check)
    and JournaledFile.scala:581-583 (stored schema != declared schema).
    """


class QueueClosedError(IOError):
    """Operation on a closed queue (reference: Queue.scala:86-96)."""
