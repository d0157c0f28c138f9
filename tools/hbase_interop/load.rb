# Create the reference's table spec and prepare for bulk load.
# Run inside the hbase container:  hbase shell -n /bulk/load.rb
#
# Table spec mirrors HbaseClient.kt:83-92: one column family,
# maxVersions = Int.MAX_VALUE, minVersions = 1, GZ compression for both
# flush and compaction. Pre-split at the exact region boundaries the
# HFiles were bucketed by (split_keys.txt), so completebulkload takes
# the no-split rename path.

table_spec = File.readlines('/bulk/out/table_spec.txt').map(&:strip)
table = table_spec[0]
family = table_spec[1]
namespace = table.split(':')[0]

splits = File.readlines('/bulk/out/split_keys.txt').map(&:strip).map do |hex|
  [hex].pack('H*')
end

# JRuby wraps HBase's Java exceptions inconsistently across shell
# versions, so rescue broadly and re-raise anything that is not the
# benign already-exists / does-not-exist case
begin
  create_namespace namespace
rescue Exception => e
  raise unless e.to_s.include?('NamespaceExist')
end

begin
  disable table
  drop table
rescue Exception
  # table did not exist — fine
end

create table,
       { NAME => family,
         VERSIONS => 2147483647,
         MIN_VERSIONS => 1,
         COMPRESSION => 'GZ',
         COMPRESSION_COMPACT => 'GZ' },
       { SPLITS => splits }

puts "created #{table} with #{splits.length + 1} regions"
exit 0
